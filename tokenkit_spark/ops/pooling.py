"""Embedding pooling — mean-pool chunk vectors into parent-document
vectors and L2-renormalize (the standard chunk→document aggregation in
retrieval pipelines; mean pooling per Reimers & Gurevych,
"Sentence-BERT", EMNLP 2019 — the pooling that wins for sentence
embeddings — applied at the chunk→doc level by every RAG indexer that
stores one vector per document).

Relational shape — the scalable one: posexplode the vectors to
(parent, dim_pos, value) rows, ONE hash aggregate per (parent,
dim_pos) for the mean, one (parent) aggregate for the norm, divide.
The dim fan-out is a flat map (no shuffle until the keyed aggregate,
which has map-side partials); no UDF touches a vector, and 10^10
chunks × 1k dims is just a 10^13-row aggregate — exactly what Spark
hash aggregation is for.  Emitting (parent, pos, value) rows instead
of array columns also keeps the result joinable/aggregatable without
re-explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mean_pool(
    vectors: DataFrame,
    parent_col,
    vec_col: str = "embedding",
    round_digits: int = 6,
    renormalize: bool = True,
) -> DataFrame:
    """``vectors``: rows with a vector column and a parent key
    expression (e.g. ``F.col('vec_id') % 128`` binning chunks to
    docs).  Returns (parent_id, pos, pooled) — the pooled parent
    vector as one row per dimension, L2-renormalized when
    ``renormalize`` (zero vectors pass through unnormalized)."""
    ex = vectors.select(
        parent_col.alias("parent_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    mean = ex.groupBy("parent_id", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    if not renormalize:
        return mean.select(
            "parent_id", "pos", F.round("m", round_digits).alias("pooled")
        )
    norm = mean.groupBy("parent_id").agg(
        F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("nrm")
    )
    return (
        mean.join(norm, "parent_id")
        .select(
            "parent_id",
            "pos",
            F.round(
                F.when(F.col("nrm") > 0, F.col("m") / F.col("nrm"))
                .otherwise(F.col("m")),
                round_digits,
            ).alias("pooled"),
        )
    )
