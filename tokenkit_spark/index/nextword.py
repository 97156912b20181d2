"""Next-word (bigram) phrase acceleration — combined-index phrase
evaluation with an exact cost/parity audit.

Williams, Zobel & Bahle, "Fast phrase querying with combined indexes"
(ACM TOIS 22(4), 2004): phrase queries evaluated purely from
single-word positional postings pay the HEAD terms' full posting
lists ("the batch" scans every posting of "the"); materializing
postings for the most frequent BIGRAMS lets the evaluator intersect
far shorter lists — the classic two-orders-of-magnitude phrase win
for a few percent extra index. A phrase is eligible for the fast
path when every consecutive bigram is in the accelerated set;
otherwise it falls back to the positional plan. Both plans are exact
(no approximation): the audit reports per query the chosen plan, the
posting rows each plan touches, and that the fast path's matches are
IDENTICAL to the positional evaluation's.

Scale shape: the bigram relation is one doc-partitioned lead() over
the positional token relation (no corpus self-join); the accelerated
set is a top-B cut of the bigram frequency aggregate; both
evaluations are the standard (query-term x postings) equi-join +
offset-alignment group — query relations are tiny, postings joins
are term-partitioned. No UDFs, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks_pos(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("pos", "term"),
    )


def nextword_audit(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    top_b: int = 200,
) -> DataFrame:
    """Per phrase query: (query_id, plan, n_matches, rows_positional,
    rows_nextword, identical) — plan = 'nextword' when every
    consecutive bigram of the phrase made the top-``top_b``
    accelerated set (ties broken cf desc, w1, w2 asc), else
    'positional'; rows_* count posting rows each evaluator touches
    (rows_nextword = 0 for ineligible queries — that index is never
    opened); identical asserts fast-path/positional match parity
    (tautologically true for positional-plan queries)."""
    toks = _toks_pos(docs, text_col)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("w2", F.lead("term").over(wd))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "pos", F.col("term").alias("w1"), "w2")
    )
    cf = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cf"))
    wb = Window.orderBy(F.col("cf").desc(), "w1", "w2")
    accel = (
        cf.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") <= top_b)
        .select("w1", "w2")
    )
    nw_index = bigrams.join(accel, ["w1", "w2"])  # the materialized index

    qterms = phrases.select(
        "query_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("qpos", "term"),
    )
    qlen = qterms.groupBy("query_id").agg(F.max("qpos").alias("maxq"))
    qbi = (
        qterms.withColumn(
            "nxt",
            F.lead("term").over(
                Window.partitionBy("query_id").orderBy("qpos")
            ),
        )
        .filter(F.col("nxt").isNotNull())
        .select("query_id", F.col("qpos").alias("bpos"),
                F.col("term").alias("w1"), F.col("nxt").alias("w2"))
    )
    # eligibility: >= 1 bigram and every bigram accelerated
    elig = (
        qbi.join(accel.withColumn("__a", F.lit(1)), ["w1", "w2"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_bi"),
            F.sum(F.coalesce(F.col("__a"), F.lit(0))).alias("n_acc"),
        )
        .withColumn("eligible", F.col("n_bi") == F.col("n_acc"))
        .select("query_id", "eligible")
    )

    # positional evaluation + cost
    pj = qterms.join(toks, "term").select(
        "query_id", "doc_id", (F.col("pos") - F.col("qpos")).alias("start"),
        "qpos",
    )
    pos_match = (
        pj.groupBy("query_id", "doc_id", "start")
        .agg(F.count_distinct("qpos").alias("nq"))
        .join(qlen, "query_id")
        .filter(F.col("nq") == F.col("maxq") + 1)
        .select("query_id", "doc_id")
        .distinct()
    )
    pos_rows = qterms.join(toks, "term").groupBy("query_id").agg(
        F.count(F.lit(1)).alias("rows_positional")
    )

    # next-word evaluation + cost (accelerated index only)
    nj = qbi.join(nw_index, ["w1", "w2"]).select(
        "query_id", "doc_id", (F.col("pos") - F.col("bpos")).alias("start"),
        "bpos",
    )
    nw_match = (
        nj.groupBy("query_id", "doc_id", "start")
        .agg(F.count_distinct("bpos").alias("nb"))
        .join(qlen, "query_id")
        .filter(F.col("nb") == F.col("maxq"))
        .select("query_id", "doc_id")
        .distinct()
    )
    nw_rows = qbi.join(nw_index, ["w1", "w2"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("rows_nextword")
    )

    pm = pos_match.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_pos")
    )
    nm = nw_match.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_nw"))
    parity = (
        pos_match.join(nw_match, ["query_id", "doc_id"], "full")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_union"))
    )
    return (
        phrases.select("query_id")
        .join(elig, "query_id", "left")
        .join(pm, "query_id", "left")
        .join(nm, "query_id", "left")
        .join(parity, "query_id", "left")
        .join(pos_rows, "query_id", "left")
        .join(nw_rows, "query_id", "left")
        .select(
            "query_id",
            F.when(F.coalesce("eligible", F.lit(False)), "nextword")
            .otherwise("positional").alias("plan"),
            F.coalesce("n_pos", F.lit(0)).alias("n_matches"),
            F.coalesce("rows_positional", F.lit(0)).alias("rows_positional"),
            F.when(
                F.coalesce("eligible", F.lit(False)),
                F.coalesce("rows_nextword", F.lit(0)),
            ).otherwise(F.lit(0)).alias("rows_nextword"),
            F.when(
                ~F.coalesce("eligible", F.lit(False)), F.lit(True)
            ).otherwise(
                (F.coalesce("n_union", F.lit(0))
                 == F.coalesce("n_pos", F.lit(0)))
                & (F.coalesce("n_union", F.lit(0))
                   == F.coalesce("n_nw", F.lit(0)))
            ).alias("identical"),
        )
        .orderBy("query_id")
    )
