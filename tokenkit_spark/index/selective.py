"""Selective pruning — route each query to a cheap or exact tier by
its predicted difficulty.

Tonellotto, Macdonald & Ounis, "Efficient and effective retrieval
using selective pruning" (WSDM 2013): aggressive dynamic pruning is
safe for EASY queries (the top-k is unambiguous) and harmful for
hard ones, and pre-retrieval query-performance predictors
(``index/qpp.py``'s AvICTF/SCS family) know the difference before
any posting is read — so route per query: predicted-easy queries go
to the pruned/cheap tier, predicted-hard to the exhaustive tier.

This audit wires the existing pieces together: the cheap tier is the
champion-list candidate evaluation (``index/champion.py`` semantics,
inlined here as top-r-by-tf candidates), the exact tier is full
BM25-style evaluation; the router thresholds AvICTF.  Per query:

    (query_id, avictf, tier, n_scored_docs, topk_overlap, top1_match)

plus the implicit summary the operator reads off: postings saved on
the routed-cheap set against the top-k damage — the WSDM'13 trade
measured on this corpus.

Scale shape: the predictor is a broadcast-side per-query aggregate
over term stats (no postings touched); each tier is the ordinary
scoring join, the cheap one over the r-bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def selective_pruning_audit(
    docs: DataFrame,
    queries: DataFrame,
    avictf_threshold: float = 4.0,
    r: int = 20,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()
    tstats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    total_tokens = toks.count()
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    # pre-retrieval AvICTF = mean over query terms of
    # log2(total_tokens / cf)  (He & Ounis 2004)
    qpp = (
        qterms.join(tstats, "term")
        .groupBy("query_id")
        .agg(
            F.avg(
                F.log2(F.lit(float(total_tokens)) / F.col("cf"))
            ).alias("avictf")
        )
    )
    w_term = F.log(F.lit(1.0) + F.col("tf")) * F.log(
        F.lit(float(n_docs)) / F.col("df")
    )
    scored_all = (
        qterms.join(tf, "term")
        .join(tstats, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(w_term).alias("s"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    )
    full_top = scored_all.withColumn(
        "rank", F.row_number().over(wq)
    ).filter(F.col("rank") <= k)
    n_full = scored_all.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_full")
    )
    # cheap tier: per query term, champion docs = top-r by (tf, doc)
    wt = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    champs = tf.withColumn("cr", F.row_number().over(wt)).filter(
        F.col("cr") <= r
    )
    cand = (
        qterms.join(champs, "term").select("query_id", "doc_id")
        .distinct()
    )
    cheap = (
        scored_all.join(cand, ["query_id", "doc_id"])
    )
    cheap_top = cheap.withColumn(
        "rank", F.row_number().over(wq)
    ).filter(F.col("rank") <= k)
    n_cheap = cheap.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_cheap")
    )
    routed = qpp.withColumn(
        "tier",
        F.when(F.col("avictf") >= avictf_threshold, "pruned")
        .otherwise("exhaustive"),
    )
    chosen = (
        routed.filter(F.col("tier") == "pruned")
        .join(cheap_top, "query_id")
        .unionByName(
            routed.filter(F.col("tier") == "exhaustive").join(
                full_top, "query_id"
            )
        )
    )
    full_ref = full_top.select(
        "query_id",
        F.col("doc_id").alias("f_doc"),
        F.col("rank").alias("f_rank"),
    )
    cmp = (
        chosen.join(
            full_ref,
            (chosen.query_id == full_ref.query_id)
            & (chosen.doc_id == F.col("f_doc")),
            "left",
        )
        .groupBy(chosen.query_id, "avictf", "tier")
        .agg(
            F.sum(F.col("f_rank").isNotNull().cast("long")).alias(
                "topk_overlap"
            ),
            F.max(
                ((F.col("rank") == 1) & (F.col("f_rank") == 1)).cast(
                    "long"
                )
            ).alias("top1_match"),
        )
    )
    counts = (
        routed.join(n_full, "query_id")
        .join(n_cheap, "query_id", "left")
        .na.fill({"n_cheap": 0})
        .select(
            "query_id",
            F.when(
                F.col("tier") == "pruned", F.col("n_cheap")
            ).otherwise(F.col("n_full")).alias("n_scored_docs"),
        )
    )
    return cmp.join(counts, "query_id").select(
        "query_id",
        F.round("avictf", round_digits).alias("avictf"),
        "tier",
        "n_scored_docs",
        "topk_overlap",
        "top1_match",
    )
