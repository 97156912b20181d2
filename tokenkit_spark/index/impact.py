"""Impact-quantized postings + score-at-a-time (SAAT) top-k.

Anh & Moffat's impact-ordered indexing ("Simplified similarity scoring
using term ranks", SIGIR 2005 line of work): instead of storing tf and
recomputing BM25 at query time, precompute each posting's full score
contribution (its IMPACT), quantize it to a small integer (here: 8-bit
uniform over the global impact range), and store postings ordered by
impact. Query evaluation is then pure integer addition — no floats, no
per-posting idf/norm math — and early termination falls out of the
ordering (all remaining postings of a segment bound the score exactly).

This module implements the quantization and the SAAT ranking
relationally:

    impact(t, d) = idf(t) * tf_sat(t, d)          (the live engine's
                   Lucene/Robertson BM25 pieces, k1=1.2, b=0.75 —
                   index/query.py:_idf)
    q(t, d)      = min(2^bits - 1, floor((impact - lo) / (hi - lo) * 2^bits))

with (lo, hi) the global impact extrema. Impacts are rounded to 6 dp
BEFORE quantization so the bucket boundary arithmetic sees identical
inputs in Spark and in the DuckDB oracle (ln() may differ in the last
ulp between libm implementations; the rounding absorbs it).

Scale shape: quantization is one postings pass + a 1-row global
extrema aggregate broadcast back (no driver data); SAAT scoring is the
same inverted-index join the BM25 path uses, but the aggregate is an
integer SUM — the cheapest possible accumulator, and the reason
impact-ordered indexes win on machine-level throughput. Returned ranks
use (int score desc, doc_id asc) — fully deterministic, no float ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )


def impact_postings(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 8,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(term, doc_id, impact, q_impact): exact BM25 per-posting impact
    (6-dp) plus its ``bits``-bit uniform quantization over the global
    range."""
    toks = _toks(docs, text_col)
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dstats = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    g = dstats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tstats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    imp = (
        postings.join(tstats, "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(g))
        .select(
            "term", "doc_id", F.round(idf * norm, 6).alias("impact")
        )
    )
    lohi = imp.agg(
        F.min("impact").alias("lo"), F.max("impact").alias("hi")
    )
    levels = float(1 << bits)
    quant = F.least(
        F.lit(int(levels) - 1),
        F.floor(
            (F.col("impact") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * F.lit(levels)
        ),
    ).cast("long")
    return imp.crossJoin(F.broadcast(lohi)).select(
        "term", "doc_id", "impact", quant.alias("q_impact")
    )


def saat_top_k(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    bits: int = 8,
) -> DataFrame:
    """Score-at-a-time top-k over the quantized impacts: integer-sum
    accumulation per (query, doc), rank by (impact_score desc, doc_id
    asc). Returns (query_id, rank, doc_id, impact_score)."""
    imp = impact_postings(docs, text_col, bits)
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(imp, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("q_impact").alias("impact_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("impact_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.select(
            "query_id",
            F.row_number().over(w).cast("long").alias("rank"),
            "doc_id",
            "impact_score",
        )
        .filter(F.col("rank") <= k)
    )


def anytime_curve(
    docs: DataFrame,
    queries: DataFrame,
    budgets=(0.1, 0.25, 0.5, 1.0),
    k: int = 10,
    text_col: str = "text",
    bits: int = 8,
) -> DataFrame:
    """Anytime score-at-a-time quality-vs-budget curve.

    Anh & Moffat, "Pruned query evaluation using pre-computed
    impacts" (SIGIR 2006) and the JASS rho-bounded traversal (Lin &
    Trotman, SIGIR 2015): with impact-ORDERED postings, truncating
    evaluation after a fixed postings budget degrades the ranking
    gracefully — the budget knob IS the latency SLO, and the curve
    (budget -> top-k agreement with the exhaustive ranking) is how an
    operator picks rho.  This audit processes, per query, only the
    highest-impact postings — the top ceil(frac * total) by
    (q_impact desc, term asc, doc_id asc), exactly the prefix a JASS
    traversal touches under that budget — and reports agreement with
    the full quantized ranking:

        (query_id, budget_frac, n_postings, n_used, topk_overlap,
         top1_match)

    Scale shape: one impact table (shared across budgets), one
    per-query window to order postings, then per-budget filtered
    aggregations — the fan-out is |budgets| filtered re-uses of the
    same shuffled relation, not |budgets| index scans."""
    imp = impact_postings(docs, text_col, bits)
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    ).distinct()
    qpost = qterms.join(imp, "term")
    wq = Window.partitionBy("query_id").orderBy(
        F.col("q_impact").desc(), F.col("term").asc(), F.col("doc_id").asc()
    )
    ranked_p = qpost.withColumn("pn", F.row_number().over(wq))
    totals = ranked_p.groupBy("query_id").agg(
        F.max("pn").alias("n_postings")
    )

    def topk(frac: float):
        lim = F.ceil(F.col("n_postings") * F.lit(frac)).cast("long")
        used = ranked_p.join(totals, "query_id").filter(
            F.col("pn") <= lim
        )
        scored = used.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_used")
        ).join(
            used.groupBy("query_id", "doc_id")
            .agg(F.sum("q_impact").alias("s"))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("s").desc(), F.col("doc_id").asc()
                    )
                ),
            )
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank"),
            "query_id",
        )
        return scored

    full = topk(1.0).select(
        "query_id",
        F.col("doc_id").alias("f_doc"),
        F.col("rank").alias("f_rank"),
    )
    out = None
    for frac in budgets:
        t = topk(frac)
        cmp = (
            t.join(
                full,
                (t.query_id == full.query_id)
                & (t.doc_id == full.f_doc),
                "left",
            )
            .groupBy(t.query_id, "n_used")
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
            .join(totals, "query_id")
            .select(
                "query_id",
                F.lit(float(frac)).alias("budget_frac"),
                "n_postings",
                "n_used",
                "topk_overlap",
                "top1_match",
            )
        )
        out = cmp if out is None else out.unionByName(cmp)
    return out
