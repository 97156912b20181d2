"""Query selectivity estimation audit — the term-independence result-
size estimates every query planner starts from (Manning, Raghavan &
Schütze, "Introduction to Information Retrieval" §1.3-§2.3 use them to
order intersections; relational optimizers are built on the same
independence assumption), next to the ACTUAL match-set sizes:

    est_conj = N * prod_i (df_i / N)          (AND, independence)
    est_disj = N * (1 - prod_i (1 - df_i/N))  (OR, inclusion-exclusion
                                               under independence)

The audit quantifies how wrong independence is on real text (terms
co-occur — conjunctions come out LARGER than estimated, the classic
correlation bias) — the input to intersection ordering, tier routing
and accumulator-budget decisions elsewhere in this engine.

Shape: df stats ride the existing postings aggregate; the products
fold as exp(sum(ln ..)) inside a per-query hash aggregate; actuals are
two distinct-count aggregates over the match join.  No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenkit_spark.index.lmsim import _relations


def selectivity_audit(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """One row per query with at least one indexed term:
    (query_id, n_terms, est_conj, act_conj, est_disj, act_disj)."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    qt = qterms.join(tstats, "term").crossJoin(F.broadcast(globals_))
    ests = qt.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.first("n_docs")
            * F.exp(F.sum(F.log(F.col("df") / F.col("n_docs")))),
            round_digits,
        ).alias("est_conj"),
        # 1 - df/N hits exactly 0 for a term in every doc; clamp so the
        # log stays finite (Spark's log(0) is NULL and would silently
        # DROP the term from the sum — the clamp keeps both engines on
        # the correct est_disj -> N limit)
        F.round(
            F.first("n_docs")
            * (
                1.0
                - F.exp(
                    F.sum(
                        F.log(
                            F.greatest(
                                1.0 - F.col("df") / F.col("n_docs"),
                                F.lit(1e-12),
                            )
                        )
                    )
                )
            ),
            round_digits,
        ).alias("est_disj"),
    )
    matched = qterms.join(postings, "term").select(
        "query_id", F.col(id_col).alias("doc_id"), "term"
    )
    per_doc = matched.groupBy("query_id", "doc_id").agg(
        F.countDistinct("term").alias("nt")
    )
    nq = qterms.join(tstats, "term").groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_indexed")
    )
    act = (
        per_doc.join(nq, "query_id")
        .groupBy("query_id")
        .agg(
            F.sum((F.col("nt") == F.col("n_indexed")).cast("int"))
            .cast("long")
            .alias("act_conj"),
            F.count(F.lit(1)).alias("act_disj"),
        )
    )
    return ests.join(act, "query_id", "left").select(
        "query_id",
        "n_terms",
        "est_conj",
        F.coalesce("act_conj", F.lit(0)).cast("long").alias("act_conj"),
        "est_disj",
        F.coalesce("act_disj", F.lit(0)).cast("long").alias("act_disj"),
    )
