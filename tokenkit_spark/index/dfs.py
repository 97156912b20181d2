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


# pinned second-stage weights: a hand-set linear model in the style of a
# trained LambdaMART's first tree-ensemble surrogate — coverage dominates,
# raw BM25 carries the base signal, long docs pay a mild prior
LTR_WEIGHTS = {
    "bm25": 1.0,
    "coverage": 2.0,       # matched_terms / query_len
    "log_sum_tf": 0.3,
    "sum_idf": 0.05,
    "log_dl": -0.2,
}


def ltr_rerank(
    spark: SparkSession,
    index: dict,
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    text_col: str = "text",
    k: int = 10,
    weights: dict | None = None,
) -> DataFrame:
    """Two-stage ranking: BM25 candidate generation through the segment
    index (stage 1), then a PINNED linear model over the LTR features
    (stage 2) — the minimal honest form of the cascade every production
    engine runs (candidates cheap and recall-oriented, rerank expensive
    and precision-oriented; Wang/Lin/Metzler 2011's cascade). The model
    is a fixed dot product so the stage is one Catalyst projection and
    the oracle can replay it exactly:

        ltr = w·(bm25, matched/qlen, ln(1+sum_tf), sum_idf, -? ln(1+dl))

    Returns (query_id, rank, doc_id, bm25, ltr_score), rank over the
    4-dp reranked score (doc_id asc ties). Reranking never changes the
    candidate SET — only its order; that invariant is the test hook."""
    w = weights or LTR_WEIGHTS
    feats = ltr_features(spark, index, docs, queries, config, text_col, k)
    score = (
        F.lit(w["bm25"]) * F.col("bm25")
        + F.lit(w["coverage"]) * F.col("matched_terms") / F.col("query_len")
        + F.lit(w["log_sum_tf"]) * F.log(F.lit(1.0) + F.col("sum_tf"))
        + F.lit(w["sum_idf"]) * F.col("sum_idf")
        + F.lit(w["log_dl"]) * F.log(F.lit(1.0) + F.col("dl"))
    )
    scored = feats.select(
        "query_id",
        "doc_id",
        "bm25",
        F.round(score, 4).alias("ltr_score"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ltr_score").desc(), F.col("doc_id").asc()
    )
    return scored.select(
        "query_id",
        F.row_number().over(wq).cast("long").alias("rank"),
        "doc_id",
        "bm25",
        "ltr_score",
    )


def keyword_cannibalization(
    docs: DataFrame,
    queries: DataFrame,
    host_expr,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Keyword-cannibalization audit — hosts competing with themselves
    in the same ranking.

    The SEO-operations reading of field collapsing (the engine-side
    fix lives in ``query.py:collapse``): when several pages of ONE
    host land in a query's top-k, they split the click mass and the
    host's strongest page ranks lower than a consolidated page would
    — the practitioner term is cannibalization.  Per (query, host)
    with >= 2 top-k results: the page count, their best and worst
    ranks, and the spread; plus hosts' totals across the query set.

    (query_id, host, n_pages, best_rank, worst_rank, rank_spread).
    ``host_expr`` maps doc_id -> host key (a Column).
    """
    from pyspark.sql import Window

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
    dfs_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(tf, "term")
        .join(dfs_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(1.0 + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("s")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("host", host_expr)
    )
    return (
        top.groupBy("query_id", "host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("rank").alias("best_rank"),
            F.max("rank").alias("worst_rank"),
        )
        .filter(F.col("n_pages") >= 2)
        .select(
            "query_id",
            "host",
            "n_pages",
            "best_rank",
            "worst_rank",
            (F.col("worst_rank") - F.col("best_rank")).alias(
                "rank_spread"
            ),
        )
    )


def content_gap_audit(
    docs: DataFrame,
    queries: DataFrame,
    min_results: int = 5,
    min_top_score: float = 2.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Content-gap audit — demand the corpus answers poorly.

    The search-driven content-planning loop (the "content gap" of SEO
    tooling, and the coverage diagnostic of federated QA): a query
    with FEW matches or a WEAK best score marks demand the corpus
    does not serve — acquisition/authoring targets, and for a crawler
    the frontier topics to prioritize.  Per query: result count, best
    score, and the gap classification:

        no_results | thin_results (< min_results) |
        weak_top (best score < min_top_score) | covered

    (query_id, n_results, top_score, gap_class).
    """
    from pyspark.sql import Window

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
    dfs_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(tf, "term")
        .join(dfs_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(1.0 + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("s")
        )
    )
    per = scored.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_results"),
        F.max(F.round("s", 6)).alias("top_score"),
    )
    base = queries.select("query_id").distinct()
    j = base.join(per, "query_id", "left").na.fill(
        {"n_results": 0}
    )
    cls = (
        F.when(F.col("n_results") == 0, "no_results")
        .when(F.col("n_results") < min_results, "thin_results")
        .when(F.col("top_score") < min_top_score, "weak_top")
        .otherwise("covered")
    )
    return j.select(
        "query_id",
        "n_results",
        F.round("top_score", round_digits).alias("top_score"),
        cls.alias("gap_class"),
    )


def domain_diversity_audit(
    docs: DataFrame,
    queries: DataFrame,
    host_expr,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Domain diversity of the top-k — how many distinct hosts does a
    ranking surface?

    The whole-SERP counterpart of ``keyword_cannibalization`` (and
    the metric host-collapse features optimize): per query, distinct
    hosts in the top-k, the largest single-host share, and the host
    entropy — low diversity is the trigger for collapse/dedup-by-site
    policies.

    (query_id, n_results, n_hosts, top_host_share, host_entropy).
    """
    from pyspark.sql import Window

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
    dfs_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(tf, "term")
        .join(dfs_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(1.0 + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("s")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("host", host_expr)
    )
    per_host = top.groupBy("query_id", "host").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_host.groupBy("query_id")
        .agg(
            F.sum("c").alias("n_results"),
            F.count(F.lit(1)).alias("n_hosts"),
            F.max("c").alias("top_c"),
            F.sum(F.col("c") * F.log("c")).alias("clogc"),
        )
        .select(
            "query_id",
            "n_results",
            "n_hosts",
            F.round(
                F.col("top_c") / F.col("n_results").cast("double"),
                round_digits,
            ).alias("top_host_share"),
            F.round(
                F.log(F.col("n_results").cast("double"))
                - F.col("clogc") / F.col("n_results"),
                round_digits,
            ).alias("host_entropy"),
        )
    )
