"""Static search-results cache sizing audit.

Baeza-Yates, Gionis, Junqueira, Murdock, Plachouras & Silvestri, "The
impact of caching on search engines" (SIGIR 2007): query streams are
so skewed that a small static cache of the most frequent queries'
RESULT PAGES absorbs a large share of traffic — and for a static
cache, filling by past query frequency is the optimal policy. The
broker answers hits without touching the index at all, so the saved
cost is each hit's full posting-traversal volume.

``static_cache_audit`` sweeps a ladder of cache sizes over a query
log and reports, per size: volume hit rate, the compulsory-miss
ceiling (distinct/volume — what even an infinite cache cannot beat),
and the fraction of posting-row traffic the cache absorbs (hits
weighted by each query's posting-list volume). That triple is the
capacity-planning curve from the paper, computed exactly.

Scale shape: one groupBy over the log (frequency table), one window
to rank queries by frequency (deterministic ties: freq desc, query
asc), a tiny per-term posting-volume aggregate joined to the query
relation, then the ladder is a range join of the ranked-query
relation against the literal size list — log-linear, no UDFs, no
driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def static_cache_audit(
    log: DataFrame,
    docs: DataFrame,
    sizes: list[int] = (1, 2, 4, 8, 16, 32, 64),
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """``log``: (qtext) one row per issued query. Returns per cache
    size: (cache_size, volume, hits, hit_rate, compulsory_miss_rate,
    rows_saved_frac) where the cache holds the ``cache_size`` most
    frequent distinct queries (freq desc, qtext asc)."""
    freq = log.groupBy("qtext").agg(F.count(F.lit(1)).alias("freq"))
    wq = Window.orderBy(F.col("freq").desc(), F.col("qtext").asc())
    ranked = freq.withColumn("qr", F.row_number().over(wq))

    # posting-row volume per query: sum over its distinct terms of the
    # term's corpus occurrence count (what the evaluator would scan)
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term")
    )
    tvol = toks.groupBy("term").agg(F.count(F.lit(1)).alias("rows"))
    qterms = freq.select(
        "qtext",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("qtext")), r"\s+"),
                    lambda x: x != "",
                )
            )
        ).alias("term"),
    )
    qvol = (
        qterms.join(tvol, "term", "left")
        .groupBy("qtext")
        .agg(F.sum(F.coalesce(F.col("rows"), F.lit(0))).alias("qrows"))
    )
    per_q = ranked.join(qvol, "qtext")

    totals = per_q.agg(
        F.sum("freq").alias("volume"),
        F.count(F.lit(1)).alias("distinct_q"),
        F.sum(F.col("freq") * F.col("qrows")).alias("total_rows"),
    )
    ladder = per_q.sparkSession.createDataFrame(
        [(int(s),) for s in sizes], "cache_size long"
    )
    hits = (
        ladder.join(per_q, per_q["qr"] <= ladder["cache_size"])
        .groupBy("cache_size")
        .agg(
            F.sum("freq").alias("hits"),
            F.sum(F.col("freq") * F.col("qrows")).alias("rows_saved"),
        )
    )
    return (
        ladder.join(hits, "cache_size", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "cache_size",
            "volume",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.col("volume"), round_digits
            ).alias("hit_rate"),
            F.round(
                (F.col("volume") - F.col("distinct_q")) / F.col("volume"),
                round_digits,
            ).alias("max_hit_rate"),
            F.round(
                F.coalesce("rows_saved", F.lit(0)) / F.col("total_rows"),
                round_digits,
            ).alias("rows_saved_frac"),
        )
        .orderBy("cache_size")
    )


def posting_cache_audit(
    log: DataFrame,
    docs: DataFrame,
    budgets: list[int] = (100, 500, 1000, 5000, 10000, 50000),
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Static POSTING-LIST cache sizing — the index-server tier below
    the results cache (Baeza-Yates et al., SIGIR 2007 §5: the QtfDf
    policy). Fill a fixed budget of posting rows with the terms that
    maximize query-hits per cached row: rank terms by qtf/df (query-log
    frequency over posting-list length; ties qtf desc, term asc), take
    the longest prefix whose cumulative posting rows fit the budget.

    ``log``: (qtext) one row per issued query. Returns per budget:
    (budget_rows, n_terms_cached, rows_cached, term_hit_rate,
    traffic_saved_frac) where term_hit_rate is the fraction of in-vocab
    query-term occurrences served from cache and traffic_saved_frac the
    fraction of posting-row traffic (Σ qtf·df) absorbed. OOV query
    terms have no posting list to cache or fetch and are excluded from
    both ratios.

    Scale shape: the log aggregates to a term-frequency relation, the
    corpus to a df relation (the same one the index build computes);
    one window gives the cumulative-rows prefix; the ladder is a range
    join against the literal budget list. No UDFs, no driver loops.
    """
    qtf = (
        log.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("qtext")), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    dft = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    terms = qtf.join(dft, "term")  # inner: OOV terms uncacheable
    w = Window.orderBy(
        (F.col("qtf") / F.col("df")).desc(),
        F.col("qtf").desc(),
        F.col("term").asc(),
    )
    ranked = terms.withColumn(
        "cum_rows",
        F.sum("df").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    totals = terms.agg(
        F.sum("qtf").alias("total_qtf"),
        F.sum(F.col("qtf") * F.col("df")).alias("total_traffic"),
    )
    ladder = log.sparkSession.createDataFrame(
        [(int(b),) for b in budgets], "budget_rows long"
    )
    picked = (
        ladder.join(ranked, ranked["cum_rows"] <= ladder["budget_rows"])
        .groupBy("budget_rows")
        .agg(
            F.count(F.lit(1)).alias("n_terms_cached"),
            F.max("cum_rows").alias("rows_cached"),
            F.sum("qtf").alias("qtf_hit"),
            F.sum(F.col("qtf") * F.col("df")).alias("traffic_hit"),
        )
    )
    return (
        ladder.join(picked, "budget_rows", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "budget_rows",
            F.coalesce("n_terms_cached", F.lit(0)).alias("n_terms_cached"),
            F.coalesce("rows_cached", F.lit(0)).alias("rows_cached"),
            F.round(
                F.coalesce("qtf_hit", F.lit(0)) / F.col("total_qtf"),
                round_digits,
            ).alias("term_hit_rate"),
            F.round(
                F.coalesce("traffic_hit", F.lit(0)) / F.col("total_traffic"),
                round_digits,
            ).alias("traffic_saved_frac"),
        )
        .orderBy("budget_rows")
    )
