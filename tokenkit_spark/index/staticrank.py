"""Static-rank index truncation — query-independent pruning by a
global document prior.

Long & Suel, "Optimized query execution in large search engines with
global page ordering" (VLDB 2003) / Richardson, Prakash & Brill
(WWW 2006 "Beyond PageRank") lineage: when the index is laid out in
descending static rank (link authority here — inlink count over the
crawl graph), a first-tier index holding only the top fraction of
documents answers most queries rank-identically, because high-BM25
docs correlate with high static rank on navigational/head queries.
The knob is the retention fraction; the audit measures, per query and
budget, how much of the EXACT top-k survives when every posting of a
doc outside the static top-B is dropped:

    (query_id, keep_frac, n_kept_docs, topk_overlap, top1_match)

Static order is pinned for the oracle: inlink count descending, ties
by doc id — docs with no inlinks rank last.  This is the
query-INDEPENDENT sibling of the term-centric Carmel pruning in
``index/pruning.py`` (which keeps per-term top-tf postings) and of
the impact-budget curve in ``index/impact.py`` (which prunes at query
time); together they cover the three classic pruning axes.

Scale shape: the static rank is one aggregation over the edge list +
one global range-partitioned rank; each budget is a semi-join of the
postings against the kept-doc set — no per-query index rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def static_rank_cutoff(
    docs: DataFrame,
    queries: DataFrame,
    edges: DataFrame,
    keep_fracs=(0.25, 0.5, 1.0),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    from tokenkit_spark.index.lmsim import _relations

    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    inlinks = edges.groupBy(F.col("dst").alias(id_col)).agg(
        F.count(F.lit(1)).alias("inlinks")
    )
    ranked_docs = (
        docs.select(id_col)
        .join(inlinks, id_col, "left")
        .na.fill({"inlinks": 0})
        .withColumn(
            "srank",
            F.row_number().over(
                Window.orderBy(
                    F.col("inlinks").desc(), F.col(id_col).asc()
                )
            ),
        )
    )
    n_docs_total = docs.select(id_col).distinct().count()
    avgdl = F.col("total_tokens") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w_term = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )

    def topk(frac: float):
        keep = int(-(-n_docs_total * frac // 1))  # ceil
        kept = ranked_docs.filter(F.col("srank") <= keep).select(id_col)
        scored = (
            qterms.join(postings, "term")
            .join(kept, id_col)  # the tier cut
            .join(tstats, "term")
            .join(dstats, id_col)
            .crossJoin(F.broadcast(globals_))
            .groupBy("query_id", id_col)
            .agg(F.sum(w_term).alias("score"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.round("score", round_digits).desc(), F.col(id_col).asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", F.col(id_col).alias("doc_id"), "rank"
            ),
            keep,
        )

    full, _ = topk(1.0)
    full = full.select(
        "query_id",
        F.col("doc_id").alias("f_doc"),
        F.col("rank").alias("f_rank"),
    )
    out = None
    for frac in keep_fracs:
        t, keep = topk(frac)
        cmp = (
            t.join(
                full,
                (t.query_id == full.query_id) & (t.doc_id == full.f_doc),
                "left",
            )
            .groupBy(t.query_id)
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
            .select(
                "query_id",
                F.lit(float(frac)).alias("keep_frac"),
                F.lit(keep).alias("n_kept_docs"),
                "topk_overlap",
                "top1_match",
            )
        )
        out = cmp if out is None else out.unionByName(cmp)
    return out
