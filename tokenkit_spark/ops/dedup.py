"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard. All DataFrame-native except the signature
computations, which are Arrow-batched pandas UDFs (numpy-vectorized).

Designed for the 100 TB regime:
* exact dedup is a single hash-groupBy (partial agg flattens skew);
* MinHash/LSH emits (band, bucket) keys and joins WITHIN buckets only —
  never an all-pairs product; bucket population is bounded by banding;
* SimHash groups by 16-bit prefix bands for Hamming candidate generation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: (text_hash, dup_count, min_doc_id),
    duplicates only. md5 keeps the oracle (DuckDB) twin trivial."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("dup_count") > 1)
    )


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_udf(num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
    """text -> array<long> MinHash signature over char-k shingles.
    Vectorized: one numpy (num_shingles x num_perm) min-reduce per doc."""
    a, b = _minhash_params(num_perm, seed)

    def _sig(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from zlib import crc32

        def one(text):
            if text is None:
                return None
            t = text.lower().encode("utf-8", "ignore")
            n = max(len(t) - shingle_k + 1, 1)
            # crc32 is deterministic across executor processes (Python's
            # built-in hash() is salted per process — never use it here)
            shingles = {crc32(t[i : i + shingle_k]) for i in range(n)}
            x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
            # h_i(x) = (a_i * x + b_i) mod M, minimized over shingles
            hv = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            return hv.min(axis=0).astype(np.int64).tolist()

        for series in batch_iter:
            yield series.map(one)

    return F.pandas_udf(_sig, ArrayType(LongType()))


def minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any MinHash band bucket.
    Returns (doc_id_a, doc_id_b, n_shared_bands), a < b."""
    rows_per_band = num_perm // bands
    sig = docs.select(
        "doc_id", minhash_udf(num_perm, shingle_k)(F.col(text_col)).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_id_a"), F.col("r.doc_id").alias("doc_id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash_udf(seed: int = 11):
    """text -> 64-bit SimHash over whitespace tokens (weighted by tf)."""

    def _sig(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from hashlib import blake2b

        def h64(t: str) -> int:
            return int.from_bytes(
                blake2b(t.encode("utf-8", "ignore"), digest_size=8, salt=seed.to_bytes(8, "little")).digest(),
                "little",
            )

        def one(text):
            if text is None:
                return None
            toks = text.lower().split()
            if not toks:
                return 0
            hs = np.fromiter((h64(t) for t in toks), dtype=np.uint64, count=len(toks))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
            v = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            out = np.uint64(0)
            for j in np.flatnonzero(v > 0):
                out |= np.uint64(1) << np.uint64(j)
            return int(out.astype(np.int64))

        for series in batch_iter:
            yield series.map(one)

    return F.pandas_udf(_sig, LongType())


def simhash_candidates(docs: DataFrame, text_col: str = "text", prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates: equal SimHash prefix band (4 rotations cover
    Hamming distance <= 3 in at least one band for 64-bit hashes)."""
    sig = docs.select("doc_id", simhash_udf()(F.col(text_col)).alias("sim"))
    shift = 64 - prefix_bits
    bands = sig.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rot"),
                        F.shiftrightunsigned(
                            F.expr(
                                f"shiftleft(sim, {16 * r}) | shiftrightunsigned(sim, {64 - 16 * r})"
                            )
                            if r
                            else F.col("sim"),
                            shift,
                        ).alias("band"),
                    )
                    for r in range(4)
                ]
            )
        ).alias("rb"),
    ).select("doc_id", "sim", F.col("rb.rot").alias("rot"), F.col("rb.band").alias("band"))
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.rot") == F.col("r.rot"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_a"),
            F.col("r.doc_id").alias("doc_id_b"),
            F.col("l.sim").alias("sim_a"),
            F.col("r.sim").alias("sim_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).drop("sim_a", "sim_b")


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for near-dup verification.
    All-DataFrame: explode n-grams, self-join on shared grams (inverted-
    index join, not cross product), |A∩B| via count, |A∪B| via sizes."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    gram_list = F.when(
        n_words >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_words - n + 1),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", F.explode(gram_list).alias("gram"))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    l, r = grams.alias("l"), grams.alias("r")
    inter = (
        l.join(r, (F.col("l.gram") == F.col("r.gram")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("doc_id_a"), F.col("r.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_grams").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_grams").alias("size_b"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )
