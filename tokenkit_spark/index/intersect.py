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


def galloping_audit(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Adaptive (galloping) vs linear-merge intersection cost audit
    for two-term conjunctions.

    Bentley & Yao (1976) doubling search, applied to posting-list
    intersection as in Demaine, Lopez-Ortiz & Munro (SODA 2000) and
    Barbay et al. (ACM JEA 2009): intersecting a short list (length
    m) against a long one (length n) by scanning both costs m + n
    comparisons, while galloping from the current position costs
    about sum over short-list elements of 2*log2(jump) — O(m log n/m)
    worst case, asymptotically better whenever the lists are
    lopsided, which Zipf guarantees for real query pairs.  The audit
    computes, per query (its two lowest-df terms):

        cost_merge  = m + n
        cost_gallop = sum_d (2 * floor(log2(jump_d)) + 2)

    with jump_d the advance in the long list between consecutive
    probe targets (exact positions from a rank join — the actual
    distances a galloping pointer travels, not a model average).

    Scale shape: per-term positions from one (term)-partitioned
    window; probe positions via an equality-free range join on the
    SMALL list only (m rows per query); no quadratic work.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    tstats = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    # the two rarest terms per query (need >= 2 distinct terms)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    pick = (
        qterms.join(tstats, "term")
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
    )
    pair = (
        pick.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.min(F.when(F.col("rn") == 1, F.col("term"))).alias(
                "t_short"
            ),
            F.min(F.when(F.col("rn") == 2, F.col("term"))).alias(
                "t_long"
            ),
            F.min(F.when(F.col("rn") == 1, F.col("df"))).alias("m"),
            F.min(F.when(F.col("rn") == 2, F.col("df"))).alias("n"),
        )
        .filter(F.col("n_terms") == 2)
    )
    wt = Window.partitionBy("term").orderBy("doc_id")
    pos = toks.withColumn("p", F.row_number().over(wt))
    shortp = pair.select("query_id", "t_short", "t_long", "m", "n").join(
        pos.select(
            F.col("term").alias("t_short"), F.col("doc_id")
        ),
        "t_short",
    )
    # probe position of each short-list doc in the long list: count of
    # long-list docs <= d == the rank the galloping pointer lands on
    longl = pos.select(
        F.col("term").alias("t_long"),
        F.col("doc_id").alias("ld"),
        F.col("p").alias("lp"),
    )
    probe = (
        shortp.join(longl, "t_long")
        .filter(F.col("ld") <= F.col("doc_id"))
        .groupBy("query_id", "doc_id", "m", "n")
        .agg(F.max("lp").alias("probe_pos"))
    )
    # also keep short docs before the first long element (probe 0)
    allshort = shortp.select("query_id", "doc_id", "m", "n")
    probe_full = (
        allshort.join(
            probe.select("query_id", "doc_id", "probe_pos"),
            ["query_id", "doc_id"],
            "left",
        )
        .na.fill({"probe_pos": 0})
    )
    ws = Window.partitionBy("query_id").orderBy("doc_id")
    jump = F.col("probe_pos") - F.coalesce(
        F.lag("probe_pos").over(ws), F.lit(0)
    )
    cost = (
        probe_full.withColumn("jump", jump)
        .withColumn(
            "c",
            2
            * F.floor(
                F.log2(F.greatest(F.col("jump"), F.lit(1)).cast("double"))
            ).cast("long")
            + 2,
        )
        .groupBy("query_id", "m", "n")
        .agg(F.sum("c").alias("cost_gallop"))
    )
    return cost.select(
        "query_id",
        "m",
        "n",
        (F.col("m") + F.col("n")).alias("cost_merge"),
        "cost_gallop",
        F.round(
            F.col("cost_gallop")
            / (F.col("m") + F.col("n")).cast("double"),
            round_digits,
        ).alias("gallop_ratio"),
    )
