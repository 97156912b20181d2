"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``      — brute-force exact top-k, pure Catalyst expressions
                         (F.aggregate/zip_with dot products): the baseline
                         and the DuckDB-oracle-checkable path.
* ``cosine_topk_batch``— the same math as a vectorized pandas UDF (numpy
                         matmul per Arrow batch): the throughput path.
* ``lsh_cosine_topk``  — random-hyperplane LSH bucketing: each vector gets
                         a signature; candidates share >= min_matches of
                         ``tables`` signature bands, then exact re-scoring.
                         This is the 100 TB path: the candidate join is
                         bucket-equality, never a cross product.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _dot_expr(vec_col, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(vec_col):
    return F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_scores(emb: DataFrame, qvec: list[float], vec_col: str = "embedding") -> DataFrame:
    qn = float(np.linalg.norm(np.asarray(qvec, dtype=np.float64)))
    return emb.withColumn(
        "cosine",
        _dot_expr(F.col(vec_col), qvec) / (_norm_expr(F.col(vec_col)) * F.lit(qn)),
    )


def cosine_topk(
    emb: DataFrame, qvec: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact brute-force cosine top-k (ties: id asc). Native expressions."""
    scored = cosine_scores(emb, qvec, vec_col)
    return (
        scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .select(id_col, "cosine")
        .limit(k)
    )


def cosine_udf(qvec: list[float]):
    """Vectorized cosine vs a fixed query vector: numpy matmul per batch."""
    q = np.asarray(qvec, dtype=np.float64)
    q = q / np.linalg.norm(q)

    def _cos(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batch_iter:
            # Arrow hands float32 arrays; lift to float64 so the batch path
            # matches the native-expression path bit-for-bit (both then
            # compute in double over float32-rounded inputs)
            mat = np.stack(series.to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            yield pd.Series(mat @ q / norms)

    return F.pandas_udf(_cos, DoubleType())


def cosine_topk_batch(
    emb: DataFrame, qvec: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    scored = emb.select(id_col, cosine_udf(qvec)(F.col(vec_col)).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 5):
    """Random-hyperplane signature: sign bits packed into a long."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def _sig(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from pyspark.sql.types import LongType  # noqa: F401

        weights = np.power(2.0, np.arange(n_planes)).astype(np.float64)
        for series in batch_iter:
            mat = np.stack(series.to_numpy())
            bits = (mat @ planes) > 0
            yield pd.Series((bits @ weights).astype(np.int64))

    from pyspark.sql.types import LongType

    return F.pandas_udf(_sig, LongType())


def lsh_cosine_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    max_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: only vectors whose hyperplane signature is within
    ``max_hamming`` bits of the query's signature are exactly scored.
    At scale the signature is a partition/bucket key; here the filter
    prunes before the (expensive) exact scoring."""
    dim = len(qvec)
    sig_udf = hyperplane_signature_udf(dim, n_planes)
    with_sig = emb.withColumn("sig", sig_udf(F.col(vec_col)))
    rng = np.random.default_rng(5)
    planes = rng.standard_normal((dim, n_planes))
    qbits = (np.asarray(qvec, dtype=np.float64) @ planes) > 0
    qsig = int((qbits @ np.power(2.0, np.arange(n_planes))).astype(np.int64))
    cand = with_sig.filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    return cosine_topk_batch(cand, qvec, k, vec_col, id_col)
