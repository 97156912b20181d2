"""Accumulator-limited query evaluation audit — the quit/continue
strategies of Moffat & Zobel ("Self-Indexing Inverted Files for Fast
Text Retrieval", TOIS 14(4), 1996) as later measured by Lester, Moffat,
Webber & Zobel ("Space-Limited Ranked Query Evaluation Using Adaptive
Pruning", WISE 2005).

Term-at-a-time ranked evaluation keeps one score accumulator per
candidate document.  With an accumulator budget L and query terms
processed rarest-first (ascending df — the standard order, so the most
selective terms claim accumulators first):

* **quit**: once the budget is reached (checked at term boundaries),
  stop processing entirely — documents keep only the contributions of
  the terms processed so far.
* **continue**: stop *creating* accumulators once the budget is
  reached, but keep *updating* existing ones with every remaining
  term — admitted documents end with their full score.

Both policies are deterministic given the processing order, so they
have exact relational semantics:

* a document's admission position is its first appearance in the
  (term_order, doc_id) posting stream; the first L distinct documents
  are admitted;
* continue top-k = exact BM25 top-k restricted to the admitted set;
* quit top-k = BM25 over terms 1..T_quit restricted to documents first
  seen at or before T_quit, where T_quit is the first term ordinal at
  which the running distinct-document count reaches L (all of that
  term's postings complete — the classic boundary check).

The audit reports, per (query, mode): the realized accumulator count
and the top-k agreement vs the unlimited exact ranking — the
effectiveness/space tradeoff the papers chart.

Why this matters at 100 TB: accumulator limiting is *the* memory story
for term-at-a-time scoring over web-scale postings; this audit measures
the quality cost of a budget using only windows partitioned by query
and hash aggregates — no per-query driver loops, nothing collected.

Reference scope: semantics from the two papers above (quit/continue
with boundary-checked budgets); the reference repo itself is
analysis-only (see /root/reference/README.md:509-553 positioning
tokenization for search indexes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.lmsim import _relations


def _bm25_contrib(k1: float, b: float):
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    return (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )


def accumulator_limited_audit(
    docs: DataFrame,
    queries: DataFrame,
    limit: int = 64,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """One row per (query_id, mode in {'quit','continue'}):
    (query_id, mode, n_acc, overlap_k, top1_same)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    # rarest-first term processing order within each query
    tw = Window.partitionBy("query_id").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    qt = (
        qterms.join(tstats, "term")
        .withColumn("t_ord", F.row_number().over(tw))
    )
    matched = (
        qt.join(postings, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            "t_ord",
            _bm25_contrib(k1, b).alias("contrib"),
        )
    )
    per_doc = matched.groupBy("query_id", "doc_id").agg(
        F.min("t_ord").alias("first_t"),
        F.sum("contrib").alias("full_score"),
    )
    aw = Window.partitionBy("query_id").orderBy(
        F.col("first_t").asc(), F.col("doc_id").asc()
    )
    per_doc = per_doc.withColumn("adm_rank", F.row_number().over(aw))

    def topk(scored, score_col):
        w = Window.partitionBy("query_id").orderBy(
            F.round(F.col(score_col), round_digits).desc(),
            F.col("doc_id").asc(),
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank")
        )

    exact_top = topk(per_doc, "full_score")

    # continue: first L distinct docs keep their full score
    cont_docs = per_doc.filter(F.col("adm_rank") <= limit)
    cont_top = topk(cont_docs, "full_score")
    cont_acc = cont_docs.groupBy("query_id").agg(
        F.count("*").alias("n_acc")
    )

    # quit: T_quit = first term ordinal at which the running distinct-doc
    # count reaches the budget (that term's postings complete); fall back
    # to the last term when the budget is never reached.
    new_per_t = per_doc.groupBy("query_id", "first_t").agg(
        F.count("*").alias("n_new")
    )
    cw = (
        Window.partitionBy("query_id")
        .orderBy("first_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = new_per_t.withColumn("cum", F.sum("n_new").over(cw))
    t_quit = cum.groupBy("query_id").agg(
        F.coalesce(
            F.min(F.when(F.col("cum") >= limit, F.col("first_t"))),
            F.max("first_t"),
        ).alias("t_quit")
    )
    quit_scores = (
        matched.join(t_quit, "query_id")
        .filter(F.col("t_ord") <= F.col("t_quit"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("quit_score"))
    )
    quit_top = topk(quit_scores, "quit_score")
    quit_acc = quit_scores.groupBy("query_id").agg(
        F.count("*").alias("n_acc")
    )

    def audit(mode_top, mode_acc, mode_name):
        ov = (
            exact_top.select("query_id", "doc_id")
            .join(mode_top.select("query_id", "doc_id"), ["query_id", "doc_id"])
            .groupBy("query_id")
            .agg(F.count("*").alias("overlap_k"))
        )
        t1 = (
            exact_top.filter(F.col("rank") == 1)
            .select("query_id", F.col("doc_id").alias("e1"))
            .join(
                mode_top.filter(F.col("rank") == 1).select(
                    "query_id", F.col("doc_id").alias("m1")
                ),
                "query_id",
            )
            .select(
                "query_id",
                (F.col("e1") == F.col("m1")).cast("int").alias("top1_same"),
            )
        )
        return (
            mode_acc.join(ov, "query_id", "left")
            .join(t1, "query_id", "left")
            .select(
                "query_id",
                F.lit(mode_name).alias("mode"),
                F.col("n_acc").cast("long").alias("n_acc"),
                F.coalesce(F.col("overlap_k"), F.lit(0))
                .cast("long")
                .alias("overlap_k"),
                F.coalesce(F.col("top1_same"), F.lit(0))
                .cast("int")
                .alias("top1_same"),
            )
        )

    return audit(cont_top, cont_acc, "continue").unionByName(
        audit(quit_top, quit_acc, "quit")
    )
