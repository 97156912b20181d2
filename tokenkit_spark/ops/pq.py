"""Product-quantization ANN (Jégou et al. 2011): subspace codebooks +
asymmetric-distance (ADC) top-k.

The third leg of the ANN ladder next to hyperplane-LSH and IVF
(ops/similarity.py): compress each L2-normalized embedding into m
uint8 codes (m bytes per vector — a 64-dim float32 vector becomes 4
bytes at m=4), then score candidates against a query with one m×k
inner-product lookup table, never touching the original floats.

Scale shape:

* Training reuses the bounded-seed + distributed-Lloyd recipe of
  train_ivf_centroids, run over all m subspaces in ONE pass per
  iteration: the kernel emits per-partition (subspace, centroid,
  count, partial-sum) rows — m*k rows per partition regardless of
  table size — and the driver reduces them in pinned order.
* Encoding is an Arrow-batched argmax per subspace; codes are a plain
  array<int> column, so the code table parquet-compresses to ~m bytes
  a row and scans stay columnar.
* ADC query builds the m×k table driver-side from the query alone and
  broadcasts it inside the kernel closure; scoring a batch is one
  numpy gather + row-sum. No shuffle: per-partition top-k rows merge
  via a global sort of candidates only.

In production the PQ scan nests inside IVF lists (IVF-PQ); here the two
stages are composable operators and tests pin recall against the exact
scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 8,
    sample: int = 20_000,
    seed: int = 11,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train m subspace codebooks of k centroids each over L2-normalized
    vectors; returns array (m, k, dim/m). Seeding is a bounded
    driver-side sample; every Lloyd iteration is one distributed pass
    emitting m*k partial rows per partition."""
    rows = emb.select(vec_col).limit(int(sample)).collect()
    x = _normalized(np.stack([np.asarray(r[0], dtype=np.float64) for r in rows]))
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.stack(
        [
            x[rng.choice(len(x), size=min(k, len(x)), replace=False), s * sub : (s + 1) * sub]
            for s in range(m)
        ]
    )  # (m, k, sub)

    vecs = emb.select(F.col(vec_col).alias("v"))
    part_schema = "pid int, sub int, centroid_id int, cnt long, vsum array<double>"

    for _ in range(iters):

        def partials(batch_iter: Iterator[pd.DataFrame], books=books):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId() if TaskContext.get() else -1
            mm, kk, ss = books.shape
            sums = np.zeros((mm, kk, ss))
            cnts = np.zeros((mm, kk), dtype=np.int64)
            for pdf in batch_iter:
                if not len(pdf):
                    continue
                mat = _normalized(np.stack(pdf["v"].to_numpy()).astype(np.float64))
                for s in range(mm):
                    xs = mat[:, s * ss : (s + 1) * ss]
                    d2 = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
                    assign = np.argmin(d2, axis=1)
                    np.add.at(sums[s], assign, xs)
                    cnts[s] += np.bincount(assign, minlength=kk)
            out = {"pid": [], "sub": [], "centroid_id": [], "cnt": [], "vsum": []}
            for s in range(mm):
                for c in np.flatnonzero(cnts[s]):
                    out["pid"].append(pid)
                    out["sub"].append(s)
                    out["centroid_id"].append(int(c))
                    out["cnt"].append(int(cnts[s][c]))
                    out["vsum"].append(sums[s][c].tolist())
            yield pd.DataFrame(out)

        parts = vecs.mapInPandas(partials, part_schema).collect()
        new_books = books.copy()
        grouped: dict[tuple[int, int], list] = {}
        for r in sorted(parts, key=lambda r: (r.sub, r.centroid_id, r.pid)):
            grouped.setdefault((r.sub, r.centroid_id), []).append(r)
        for (s, c), rs in grouped.items():
            total = np.sum([np.asarray(r.vsum) for r in rs], axis=0)
            n = sum(r.cnt for r in rs)
            if n:
                new_books[s][c] = total / n
        books = new_books
    return books


def pinned_pq_codebooks(m: int = 8, k: int = 32, ss: int = 8) -> np.ndarray:
    """Deterministic closed-form PQ codebooks (m subspaces x k codes x
    ss dims):

        c[s, j, t] = ((t*t*5 + t*g*7 + g*g*3) % 23) - 11,  g = s*k + j

    Integer entries in [-11, 11], exact in float64 and computable in
    ANSI SQL — the DuckDB oracle replays encode (argmin L2 per
    subspace), the ADC gather-sum, and the exact refine, making the
    whole PQ path value-verifiable (VERDICT r04 item 4). The k-means-
    trained path stays in train_pq_codebooks (pytest recall bounds)."""
    g = (np.arange(m)[:, None] * k + np.arange(k)[None, :])  # (m, k)
    t = np.arange(ss)[None, None, :]
    g = g[:, :, None]
    return ((t * t * 5 + t * g * 7 + g * g * 3) % 23 - 11).astype(np.float64)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>): nearest centroid per subspace over the
    L2-normalized vector — the m-byte compressed representation."""
    books = np.asarray(codebooks, dtype=np.float64)

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mm, kk, ss = books.shape
        for pdf in batch_iter:
            if not len(pdf):
                yield pd.DataFrame({id_col: [], "codes": []})
                continue
            mat = _normalized(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            codes = np.empty((len(mat), mm), dtype=np.int32)
            for s in range(mm):
                xs = mat[:, s * ss : (s + 1) * ss]
                d2 = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return emb.select(id_col, vec_col).mapInPandas(
        fn, f"{id_col} long, codes array<int>"
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC approximate top-k by cosine: score(x) ~= sum_s q_s . c_{s,
    code_s(x)} — an m-gather row-sum per vector against the driver-built
    m×k query table. Ties pinned (score desc, id asc)."""
    books = np.asarray(codebooks, dtype=np.float64)
    mm, kk, ss = books.shape
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    table = np.stack(
        [books[s] @ q[s * ss : (s + 1) * ss] for s in range(mm)]
    )  # (m, k)

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            if not len(pdf):
                yield pd.DataFrame({id_col: [], "adc_score": []})
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            scores = table[np.arange(mm)[None, :], codes].sum(axis=1)
            # per-batch shortlist: only candidates can survive the global sort
            order = np.lexsort((pdf[id_col].to_numpy(), -scores))[: k * 4]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[order],
                    "adc_score": np.round(scores[order], 6),
                }
            )

    cand = codes_df.mapInPandas(fn, f"{id_col} long, adc_score double")
    return cand.orderBy(F.col("adc_score").desc(), F.col(id_col).asc()).limit(k)


def pq_topk_refined(
    emb: DataFrame,
    codes_df: DataFrame,
    codebooks: np.ndarray,
    qvec: list[float],
    k: int = 10,
    refine: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ-with-refine (the FAISS IndexRefineFlat pattern): ADC generates
    a k*refine candidate shortlist from the compressed codes, then exact
    cosine re-ranks ONLY that shortlist against the original vectors.
    The expensive float scan touches k*refine rows instead of the
    corpus; the broadcast semi-join keeps it shuffle-free."""
    from .similarity import cosine_scores

    shortlist = pq_topk(codes_df, codebooks, qvec, k=k * refine, id_col=id_col)
    cand = emb.join(F.broadcast(shortlist.select(id_col)), id_col)
    scored = cosine_scores(cand, [float(x) for x in qvec], vec_col=vec_col)
    return (
        scored.select(id_col, F.round(F.col("cosine"), 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
