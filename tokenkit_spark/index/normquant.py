"""Length-norm quantization drift audit — the Lucene norms-encoding
design point made measurable: Lucene stores each document's field
length in ONE byte per field (SmallFloat 4-significant-bit scheme,
``SmallFloat.longToInt4`` / ``intToByte4``), so BM25's length
normalization runs on a lossy dl. This operator scores the query set
twice — exact dl vs 4-significant-bit-floored dl (avgdl recomputed
from the quantized lengths, as Lucene does) — and reports, per
(query, rank), the quantized-norm top-k with its exact-norm twin
score and whether the doc also appears in the exact top-k.

The quantizer keeps the top 4 significant bits and floors the rest:

    q(dl) = dl                              if dl < 16
          = (dl >> s) << s, s = bits(dl)-4  otherwise

implemented with exact INTEGER bit ops on both engines (bit-length via
``bin()`` string length; shifts via shiftright/shiftleft) — no float
log2 at bucket boundaries, so the Spark plan and the DuckDB oracle
agree bit-for-bit.

Scale shape: one tokenize pass, two scoring aggregations sharing it;
everything relational (the audit is an offline index-design question,
not a serving path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .codec import B, K1
from .query import _idf


def _quantize_dl(col_name: str):
    """4-significant-bit floor quantization, exact integer arithmetic
    (SQL expr: pyspark's shiftleft/shiftright helpers only take literal
    shift counts, the SQL builtins take columns)."""
    c = col_name
    return F.expr(
        f"CASE WHEN {c} < 16 THEN {c} ELSE "
        f"shiftleft(shiftright({c}, length(bin({c})) - 4), "
        f"length(bin({c})) - 4) END"
    )


def norm_quantization_drift(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    qtext_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """(query_id, rank, doc_id, score_q, score_exact, in_exact_topk)
    ranked by the QUANTIZED-norm score (round 4, doc_id tiebreak)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    postings = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dstats = (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
        .withColumn("dl_q", _quantize_dl("dl"))
    )
    g = dstats.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.avg("dl_q").alias("avgdl_q"),
    ).collect()[0]
    n_docs = int(g.n_docs)
    qterms = (
        queries.select(
            "query_id",
            F.explode(F.split(F.lower(F.col(qtext_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    tstats = postings.groupBy("term").agg(F.count("*").alias("df"))

    def norm(dl_col, avgdl):
        return F.col("tf") * (K1 + 1.0) / (
            F.col("tf") + K1 * (1.0 - B + B * dl_col / F.lit(float(avgdl)))
        )

    scored = (
        F.broadcast(qterms)
        .join(postings, "term")
        .join(tstats, "term")
        .join(dstats, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(_idf(F.col("df"), n_docs) * norm(F.col("dl_q"), g.avgdl_q)),
                4,
            ).alias("score_q"),
            F.round(
                F.sum(_idf(F.col("df"), n_docs) * norm(F.col("dl"), g.avgdl)), 4
            ).alias("score_exact"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("score_exact").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn(
        "rank", F.row_number().over(wq).cast("long")
    ).withColumn("rank_exact", F.row_number().over(we).cast("long"))
    return ranked.filter(F.col("rank") <= k).select(
        "query_id",
        "rank",
        "doc_id",
        "score_q",
        "score_exact",
        (F.col("rank_exact") <= k).cast("long").alias("in_exact_topk"),
    )
