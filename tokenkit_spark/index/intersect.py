"""Conjunctive intersection order — the textbook query-optimization
cost audit, computed exactly.

Manning, Raghavan & Schütze, *Introduction to Information Retrieval*
§1.3 (and every production engine since): intersect conjunctive
posting lists in ASCENDING document-frequency order, so the candidate
set collapses as early as possible. Under the standard merge cost
model, processing order t_1..t_n costs

    cost = df(t_1) + Σ_{i=2..n} ( |cand_{i-1}| + df(t_i) )

where cand_i is the intersection after i lists. The Σ df term is
order-invariant, so the decision variable is Σ_{i=1..n-1} |cand_i| —
this audit computes BOTH the as-written query order and the
ascending-df order exactly on the corpus, per query, from one
postings join (no per-ordering rescans: a doc's contribution to every
prefix is its longest fully-matched prefix length, Σ_i |cand_i| =
Σ_d min(c(d), n-1)).

Scale shape: query relations are tiny; one distinct-postings join per
ordering label (the same term-keyed shuffle), one window per
(query, ordering, doc) group, two aggregates. No UDFs, no loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def intersection_order_audit(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Per query: (query_id, n_terms, n_matches, cost_query_order,
    cost_ascending, saving_frac) — costs per the merge model above;
    saving_frac = 1 - cost_ascending / cost_query_order (0.0 when the
    query order already is ascending, or for single-term queries)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    postings = toks.distinct()
    dft = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qt_raw = queries.select(
        "query_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("qpos", "term"),
    )
    # distinct terms, keeping each term's first position
    qt = qt_raw.groupBy("query_id", "term").agg(
        F.min("qpos").alias("qpos")
    ).join(dft, "term", "left").withColumn(
        "df", F.coalesce(F.col("df"), F.lit(0))
    )
    w_query = Window.partitionBy("query_id").orderBy("qpos")
    w_asc = Window.partitionBy("query_id").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    orderings = qt.select(
        "query_id", "term", "df",
        F.lit("query").alias("ordering"),
        F.row_number().over(w_query).alias("ord"),
    ).unionByName(
        qt.select(
            "query_id", "term", "df",
            F.lit("asc").alias("ordering"),
            F.row_number().over(w_asc).alias("ord"),
        )
    )
    stats = orderings.groupBy("query_id", "ordering").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("df").alias("sum_df"),
    )
    # c(d): longest fully-matched prefix = max rn where ord == rn
    matched = orderings.join(postings, "term").select(
        "query_id", "ordering", "doc_id", "ord"
    )
    w_doc = Window.partitionBy("query_id", "ordering", "doc_id").orderBy(
        "ord"
    )
    c_d = (
        matched.withColumn("rn", F.row_number().over(w_doc))
        .filter(F.col("ord") == F.col("rn"))
        .groupBy("query_id", "ordering", "doc_id")
        .agg(F.max("rn").alias("c"))
    )
    agg = (
        c_d.join(stats, ["query_id", "ordering"])
        .groupBy("query_id", "ordering")
        .agg(
            F.sum(F.least(F.col("c"), F.col("n_terms") - 1))
            .alias("sum_cand"),
            F.sum((F.col("c") == F.col("n_terms")).cast("long"))
            .alias("n_matches"),
        )
    )
    per_ord = stats.join(agg, ["query_id", "ordering"], "left").select(
        "query_id", "ordering", "n_terms",
        (F.col("sum_df") + F.coalesce("sum_cand", F.lit(0))).alias("cost"),
        F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
    )
    q = per_ord.filter(F.col("ordering") == "query").select(
        "query_id", "n_terms", "n_matches",
        F.col("cost").alias("cost_query_order"),
    )
    a = per_ord.filter(F.col("ordering") == "asc").select(
        "query_id", F.col("cost").alias("cost_ascending")
    )
    return (
        q.join(a, "query_id")
        .select(
            "query_id", "n_terms", "n_matches", "cost_query_order",
            "cost_ascending",
            F.when(
                F.col("cost_query_order") > 0,
                F.round(
                    1.0 - F.col("cost_ascending") / F.col("cost_query_order"),
                    round_digits,
                ),
            ).otherwise(F.lit(0.0)).alias("saving_frac"),
        )
        .orderBy("query_id")
    )
