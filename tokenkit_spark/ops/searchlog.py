"""Search-log session analytics and privacy-release auditing.

* **Session success metrics**: per search session, query volume,
  click volume, reformulation count and abandonment — the
  log-analysis battery of Jansen & Spink ("How are we searching the
  World Wide Web?", IP&M 2006) and the abandonment framing of Li,
  Huffman & Tokuda ("Good abandonment in mobile and PC internet
  search", SIGIR 2009).  An abandoned session issued queries but never
  clicked — the primary dissatisfaction proxy when no relevance labels
  exist.

* **k-anonymity release audit**: before a query log leaves the
  pipeline, queries issued by fewer than k distinct users must be
  suppressed (the AOL-log lesson; Adar, "User 4XXXXX9: Anonymizing
  query logs", WWW 2007 workshop) — this audit reports exactly how
  much of the log survives a given k.

Scale shape: both are one or two hash aggregates keyed by session /
query string plus a window bounded by a session's own rows.  A
10^9-session log shards on session_id; the anonymity audit shards on
the query string.  No UDFs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_success(
    qlog: DataFrame,
    clicks: DataFrame,
    session_col: str = "session_id",
    order_col: str = "step",
    query_col: str = "query",
) -> DataFrame:
    """``qlog``: (session_id, step, query); ``clicks``: (session_id,
    step) — a click attributed to the query issued at that step.
    Returns one row per session: (session_id, n_queries, n_clicks,
    n_reformulations, abandoned) where a reformulation is a
    consecutive in-session pair of DIFFERENT query strings (the
    query-flow-graph edge definition, ops/queryflow.py)."""
    w = Window.partitionBy(session_col).orderBy(order_col)
    q = qlog.withColumn(
        "_ref",
        (
            F.lag(query_col).over(w).isNotNull()
            & (F.lag(query_col).over(w) != F.col(query_col))
        ).cast("int"),
    )
    per_q = q.groupBy(session_col).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("_ref").cast("long").alias("n_reformulations"),
    )
    per_c = clicks.groupBy(session_col).agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return (
        per_q.join(per_c, session_col, "left")
        .select(
            session_col,
            "n_queries",
            F.coalesce("n_clicks", F.lit(0)).cast("long").alias("n_clicks"),
            "n_reformulations",
            (F.coalesce("n_clicks", F.lit(0)) == 0).alias("abandoned"),
        )
    )


def k_anonymity_audit(
    qlog: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """One summary row: (k, n_rows, n_distinct_queries,
    n_suppressed_queries, n_suppressed_rows, frac_rows_released).
    A query is suppressed when fewer than ``k`` DISTINCT users issued
    it; all its log rows are withheld from the release."""
    per_query = qlog.groupBy(query_col).agg(
        F.countDistinct(user_col).alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_query.agg(
        F.lit(k).alias("k"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_queries"),
        F.sum((F.col("n_users") < k).cast("int"))
        .cast("long")
        .alias("n_suppressed_queries"),
        F.sum(F.when(F.col("n_users") < k, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_suppressed_rows"),
        F.round(
            1.0
            - F.sum(
                F.when(F.col("n_users") < k, F.col("n_rows")).otherwise(0)
            )
            / F.sum("n_rows"),
            round_digits,
        ).alias("frac_rows_released"),
    )


def l_diversity_audit(
    qlog: DataFrame,
    l: int = 2,
    k: int = 3,
    user_col: str = "user_id",
    quasi_col: str = "query",
    sensitive_col: str = "domain",
) -> DataFrame:
    """l-diversity audit of a k-anonymized query-log release
    (Machanavajjhala et al., "l-Diversity: Privacy Beyond
    k-Anonymity", ICDE 2006; the post-AOL-release lesson Adar 2007
    codifies): a group that passes k-anonymity (>= k distinct users)
    can still leak via the HOMOGENEITY attack when every row shares
    one sensitive value (here: the clicked domain) — distinct
    l-diversity additionally requires >= l distinct sensitive values
    per released group.

    One row per k-anonymous group: (quasi value, n_users, n_rows,
    n_sensitive, l_ok) — groups failing k-anonymity are already
    suppressed upstream and do not appear.  Two hash aggregates on the
    quasi-identifier key; nothing user-level leaves the executors."""
    per = qlog.groupBy(quasi_col).agg(
        F.countDistinct(user_col).alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
    )
    return per.filter(F.col("n_users") >= k).select(
        quasi_col,
        "n_users",
        "n_rows",
        "n_sensitive",
        (F.col("n_sensitive") >= l).alias("l_ok"),
    )
