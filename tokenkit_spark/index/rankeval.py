"""Search-quality evaluation — the ES `_rank_eval` API, relationally.

Given a ranked result table and a graded judgment table, compute the
standard ranking metrics per query:

* precision@k / recall@k  (relevant = grade > 0)
* MRR                      (reciprocal rank of the first relevant hit)
* NDCG@k                   (exponential gain (2^grade - 1)/log2(rank+1),
                            ideal ordering from the query's judgments)

Why this matters at 100 TB: ranking evaluation over millions of logged
queries is itself a data-pipeline job — per-query metrics are one
(query_id)-keyed join + aggregate, the ideal-DCG window is partitioned
per query and bounded by that query's judged docs (never corpus-sized),
and means reduce over query count. Nothing touches the driver.

Reference: the ES rank evaluation API contract (metric definitions);
gain/discount follow the ES dcg metric (exponential gain, log2
discount).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """``results``: (query_id, rank, doc_id) with rank 1-based;
    ``judgments``: (query_id, doc_id, grade) — unjudged docs count as
    grade 0 (the ES default). Returns one row per query:
    (query_id, precision_k, recall_k, mrr, dcg, idcg, ndcg)."""
    graded = (
        results.filter(F.col("rank") <= k)
        .join(judgments, ["query_id", "doc_id"], "left")
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
    )
    per_q = graded.groupBy("query_id").agg(
        (F.sum((F.col("grade") > 0).cast("int")) / F.lit(float(k))).alias(
            "precision_k"
        ),
        F.coalesce(
            1.0
            / F.min(F.when(F.col("grade") > 0, F.col("rank"))),
            F.lit(0.0),
        ).alias("mrr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
            / F.log2(F.col("rank") + F.lit(1.0))
        ).alias("dcg"),
    )
    # total relevant + ideal DCG from the judgment side (per-query window,
    # bounded by judged docs per query)
    jw = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc()
    )
    ideal = (
        judgments.filter(F.col("grade") > 0)
        .withColumn("irank", F.row_number().over(jw))
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_relevant"),
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                    / F.log2(F.col("irank") + F.lit(1.0)),
                ).otherwise(0.0)
            ).alias("idcg"),
        )
    )
    out = per_q.join(ideal, "query_id", "left").select(
        "query_id",
        F.round("precision_k", round_digits).alias("precision_k"),
        F.round(
            F.when(
                F.col("n_relevant").isNull() | (F.col("n_relevant") == 0), 0.0
            ).otherwise(
                F.col("precision_k") * k / F.col("n_relevant")
            ),
            round_digits,
        ).alias("recall_k"),
        F.round("mrr", round_digits).alias("mrr"),
        F.round("dcg", round_digits).alias("dcg"),
        F.round(F.coalesce("idcg", F.lit(0.0)), round_digits).alias("idcg"),
        F.round(
            F.when(
                F.col("idcg").isNull() | (F.col("idcg") == 0.0), 0.0
            ).otherwise(F.col("dcg") / F.col("idcg")),
            round_digits,
        ).alias("ndcg"),
    )
    return out
