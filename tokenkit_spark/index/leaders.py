"""Cluster-pruning (leader/follower) inexact retrieval audit.

Manning, Raghavan & Schütze, "Introduction to Information Retrieval",
§7.1.6: pick ~√N documents as LEADERS, attach every document to its
most-similar leader (its FOLLOWERS), and at query time score only the
best leader's cluster — the lexical ancestor of IVF ANN search (the
embedding twin lives in ``ops/similarity.py:ivf_topk``; this is the
same coarse-quantize-then-refine shape over tf vectors).

Determinism contract (everything rerun/cluster-size stable, like all
sampling in this repo): leaders are docs with ``doc_id % leader_mod
== 0``; doc→leader similarity is the tf dot product Σ_t tf_d·tf_l
(ties to the smaller leader id; docs sharing no term with any leader
form leader -1's orphan cluster and are reachable only by the
fallback); query→leader affinity is corpus-global BM25.  The audit
reports, per reference query, the chosen leader, its cluster size
(the candidate count), and the exact-top-k overlap — the recall side
of the √N-fold candidate cut.

Scale shape: doc→leader assignment is one (term)-keyed equi-join
bounded by the leader postings (|leaders| ≈ N/leader_mod rows per
term at worst), one argmax window per doc; query evaluation reuses
the stock scoring plan over a semi-joined candidate set.  No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_pruning_audit(
    docs: DataFrame,
    queries: DataFrame,
    leader_mod: int = 20,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Per query: (query_id, leader, cluster_size, topk_overlap,
    candidate_frac)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))

    lead_post = postings.filter(F.col("doc_id") % leader_mod == 0).select(
        "term", F.col("doc_id").alias("leader"), F.col("tf").alias("ltf")
    )
    # doc -> most-similar leader by tf dot product
    sim = (
        postings.join(lead_post, "term")
        .groupBy("doc_id", "leader")
        .agg(F.sum(F.col("tf") * F.col("ltf")).alias("dot"))
    )
    wa = Window.partitionBy("doc_id").orderBy(
        F.col("dot").desc(), F.col("leader").asc()
    )
    assign = (
        sim.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("doc_id", "leader")
    )
    assign = (
        dstats.select("doc_id")
        .join(assign, "doc_id", "left")
        .withColumn("leader", F.coalesce("leader", F.lit(-1)))
    )
    cluster_sizes = assign.groupBy("leader").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )

    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("term"),
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = F.col("tf") * (1.2 + 1.0) / (
        F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    )

    def score(match):
        return (
            match.join(df_t, "term")
            .join(dstats, "doc_id")
            .crossJoin(F.broadcast(globals_))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(idf * sat).alias("s"))
        )

    full_match = qterms.join(postings, "term")
    scored_all = score(full_match)
    # best leader per query = top-scoring LEADER document
    lead_scored = scored_all.filter(F.col("doc_id") % leader_mod == 0)
    wl = Window.partitionBy("query_id").orderBy(
        F.round(F.col("s"), round_digits).desc(), F.col("doc_id").asc()
    )
    best_leader = (
        lead_scored.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("doc_id").alias("leader"))
    )
    # candidates = the chosen leader's followers (leader included)
    cand = best_leader.join(assign, "leader").select(
        "query_id", "doc_id"
    )
    cand_top = (
        scored_all.join(cand, ["query_id", "doc_id"], "left_semi")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.round(F.col("s"), round_digits).desc(),
                    F.col("doc_id").asc(),
                )
            ),
        )
        .filter(F.col("rk") <= k)
    )
    full_top = (
        scored_all.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.round(F.col("s"), round_digits).desc(),
                    F.col("doc_id").asc(),
                )
            ),
        )
        .filter(F.col("rk") <= k)
    )
    overlap = (
        full_top.select("query_id", "doc_id")
        .join(
            cand_top.select("query_id", "doc_id"),
            ["query_id", "doc_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("topk_overlap"))
    )
    n_full = (
        full_match.select("query_id", "doc_id").distinct()
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_full"))
    )
    return (
        best_leader.join(cluster_sizes, "leader")
        .join(overlap, "query_id", "left")
        .join(n_full, "query_id")
        .select(
            "query_id",
            "leader",
            "cluster_size",
            F.coalesce("topk_overlap", F.lit(0)).cast("long").alias(
                "topk_overlap"
            ),
            F.round(
                F.col("cluster_size") / F.col("n_full"), round_digits
            ).alias("candidate_frac"),
        )
    )
