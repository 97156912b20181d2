"""BM25 hard-negative mining for dense-retriever training.

The standard recipe for training dual encoders (Karpukhin et al.,
"Dense passage retrieval", EMNLP 2020 §3.2; Xiong et al., ANCE, ICLR
2021): for each training query, positives are the docs that actually
satisfy it, and the most useful negatives are NOT random — they are
the top-scoring BM25 docs that are lexically close but wrong ("hard"
negatives). This operator mines them relationally: full-corpus BM25
top list per query, minus the positive set, keep the top-k remainder.

Positive definition, pinned for the oracle: a doc is positive for a
query iff it contains EVERY query term (conjunctive boolean match) —
the exact-match qrel stand-in; hard negatives are then high-BM25
partial matches, which is precisely the distribution ANCE-style
training wants.

Scale shape: one tokenize pass feeds postings/doc-stats/term-stats
(shared shapes with every BM25 audit here), the query join touches
only the query terms' postings, the positive set is a conjunctive
count == n_terms aggregate (no per-term intersection loop), and the
anti-join runs on (query, doc) keys. At 10^12 docs the mined
negatives are written once and reused across training epochs."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, rank, doc_id, score): per query the top-``k``
    highest-BM25 docs that do NOT contain all query terms, rank by
    (6-dp score desc, doc_id)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dstats = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    glob = dstats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tstats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    ).distinct()
    qsizes = qterms.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms")
    )
    matched = (
        qterms.join(postings, "term")
        .join(tstats, "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(glob))
    )
    scored = (
        matched.withColumn(
            "__s",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * (1.2 + 1.0)
            / (
                F.col("tf")
                + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("__s"), round_digits).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    negatives = scored.join(qsizes, "query_id").filter(
        F.col("n_matched") < F.col("n_terms")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        negatives.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
