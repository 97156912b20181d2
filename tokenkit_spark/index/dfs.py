"""Distributed term-statistics audits.

dfs_vs_local_scoring — the ES ``dfs_query_then_fetch`` question made
measurable: in a sharded search engine, the default (query_then_fetch)
scores each shard with its OWN (df, N), so the same (term, doc) pair
gets a different idf on different shards and the merged global ranking
can disagree with the single-index truth; the DFS pre-phase fixes it by
broadcasting global term statistics first. This operator scores one
query set BOTH ways over an explicitly sharded corpus and reports, per
query, how far the local-stats ranking drifts from the global-stats
(ground-truth) ranking: top-k overlap, whether rank 1 survives, and the
worst rank shift among shared docs.

Length normalization stays corpus-global in both modes (avgdl skew
across shards is second-order; isolating the idf effect is the point —
the same isolation ES's DFS phase makes).

Sharding is ``doc_id % n_shards`` — deterministic and SQL-replicable,
standing in for the hash-routing a real deployment uses.

ltr_features — the learning-to-rank feature-extraction stage (the
offline twin of ES's LTR feature logging): for each (query, candidate)
pair in the engine's BM25 top-k, emit the classic lexical feature set
(bm25, matched/query term counts, tf and idf aggregates, doc length)
as one relation ready for pairwise training. Candidates come from the
compressed-segment engine; features recompute relationally in one
tokenize pass + broadcast-joined query terms — no per-query scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .codec import B, K1
from .query import _idf, analyze_queries, bm25_segments
from ..analyzers.core import AnalyzerConfig


def _postings(docs: DataFrame, text_col: str) -> DataFrame:
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def dfs_vs_local_scoring(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    qtext_col: str = "text",
    n_shards: int = 4,
    k: int = 10,
) -> DataFrame:
    """Per query: (query_id, overlap_k, top1_same, max_rank_shift,
    n_shared) comparing local-shard-idf top-k against global-idf top-k
    (rounded-score ranking, ties by doc_id — the engine's pinned
    order)."""
    postings = _postings(docs, text_col).withColumn(
        "shard", (F.col("doc_id") % n_shards).cast("int")
    )
    dstats = postings.groupBy("doc_id", "shard").agg(F.sum("tf").alias("dl"))
    g = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(g.n_docs), float(g.avgdl)

    qterms = (
        queries.select(
            "query_id",
            F.explode(F.split(F.lower(F.col(qtext_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # global df vs per-shard (df_s, N_s)
    tstats = postings.groupBy("term").agg(F.count("*").alias("df"))
    shard_n = dstats.groupBy("shard").agg(F.count("*").alias("n_docs_s"))
    tstats_s = (
        postings.groupBy("shard", "term")
        .agg(F.count("*").alias("df_s"))
        .join(F.broadcast(shard_n), "shard")
    )
    norm = F.col("tf") * (K1 + 1.0) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
    )
    base = (
        F.broadcast(qterms)
        .join(postings, "term")
        .join(dstats, ["doc_id", "shard"])
        .join(tstats, "term")
        .join(tstats_s, ["shard", "term"])
    )
    idf_local = F.log(
        F.lit(1.0)
        + (F.col("n_docs_s") - F.col("df_s") + 0.5) / (F.col("df_s") + 0.5)
    )
    scored = base.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(_idf(F.col("df"), n_docs) * norm), 4).alias("s_global"),
        F.round(F.sum(idf_local * norm), 4).alias("s_local"),
    )

    def topk(col):
        w = Window.partitionBy("query_id").orderBy(
            F.col(col).desc(), F.col("doc_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", F.col("rank").alias(f"rank_{col[2:]}"))
        )

    gtop, ltop = topk("s_global"), topk("s_local")
    joined = gtop.join(ltop, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        "rank_global",
        "rank_local",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.sum(
                (
                    F.col("rank_global").isNotNull()
                    & F.col("rank_local").isNotNull()
                ).cast("long")
            ).alias("overlap_k"),
            F.coalesce(
                F.max(
                    (
                        (F.col("rank_global") == 1) & (F.col("rank_local") == 1)
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("top1_same"),
            F.coalesce(
                F.max(F.abs(F.col("rank_global") - F.col("rank_local"))),
                F.lit(0),
            ).cast("long").alias("max_rank_shift"),
        )
        .orderBy("query_id")
    )


def ltr_features(
    spark: SparkSession,
    index: dict,
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """(query_id, doc_id, bm25, query_len, matched_terms, sum_tf,
    max_tf, sum_idf, dl) for the engine's BM25 top-k candidates —
    candidate generation through the compressed segment index, feature
    recomputation relational (one tokenize pass, broadcast query
    terms)."""
    cfg = config or AnalyzerConfig()
    cands = bm25_segments(spark, index, queries, cfg, k=k, round_digits=4).select(
        "query_id", "doc_id", F.col("score").alias("bm25")
    )
    postings = _postings(docs, text_col)
    dstats = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tstats = postings.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = dstats.count()
    q_terms = analyze_queries(queries, cfg).distinct()
    qlen = q_terms.groupBy("query_id").agg(F.count("*").alias("query_len"))
    matches = (
        F.broadcast(q_terms)
        .join(postings, "term")
        .join(tstats, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("matched_terms"),
            F.sum("tf").alias("sum_tf"),
            F.max("tf").alias("max_tf"),
            F.round(F.sum(_idf(F.col("df"), n_docs)), 4).alias("sum_idf"),
        )
    )
    return (
        cands.join(matches, ["query_id", "doc_id"])
        .join(dstats, "doc_id")
        .join(F.broadcast(qlen), "query_id")
        .select(
            "query_id", "doc_id", "bm25", "query_len", "matched_terms",
            "sum_tf", "max_tf", "sum_idf", "dl",
        )
    )
