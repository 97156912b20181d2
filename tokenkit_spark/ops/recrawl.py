"""Recrawl scheduling: page change-rate estimation (Cho &
Garcia-Molina, "Estimating Frequency of Change", ACM TOIT 2003).

A crawler revisits a URL n times at (roughly) even intervals and
observes X visits where the content hash changed. Treating changes as
Poisson with rate λ, the naive X/n estimator biases low (two changes
between visits count once); the consistent estimator is

    λ̂ = -ln(1 - X/n) / Δ̄        (Δ̄ = mean interval between visits)

and the revisit interval that keeps expected staleness below a target
freshness is proportional to 1/λ̂. X == n (changed every single visit)
degenerates (ln 0); the standard fix caps X at n - 1/2 — a page that
changes faster than we visit pins to the fastest allowed cadence.

Scale shape: one projection over the per-URL visit summary (already one
row per URL — the crawl log rollup is a plain count/sum aggregate
upstream); no joins, no windows. The output (url, lambda_hat,
revisit_days) feeds straight into the frontier priority column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def change_rates(
    history: DataFrame,
    url_col: str = "url",
    visits_col: str = "n_visits",
    changes_col: str = "n_changed",
    interval_col: str = "interval_days",
    min_revisit_days: float = 0.5,
    max_revisit_days: float = 120.0,
    round_digits: int = 6,
) -> DataFrame:
    """(url, n_visits, n_changed, interval_days) -> (url, change_ratio,
    lambda_hat, revisit_days): the Cho–Garcia-Molina λ̂ with the
    X <= n - 1/2 cap, and the clamped 1/λ̂ revisit interval (pages that
    never changed get the max interval)."""
    n = F.col(visits_col).cast("double")
    x = F.least(F.col(changes_col).cast("double"), n - 0.5)
    lam = -F.log(1.0 - x / n) / F.col(interval_col)
    revisit = F.when(F.col(changes_col) <= 0, F.lit(float(max_revisit_days))).otherwise(
        F.least(
            F.lit(float(max_revisit_days)),
            F.greatest(F.lit(float(min_revisit_days)), 1.0 / lam),
        )
    )
    return history.select(
        url_col,
        F.round(F.col(changes_col) / n, round_digits).alias("change_ratio"),
        F.round(lam, round_digits).alias("lambda_hat"),
        F.round(revisit, round_digits).alias("revisit_days"),
    )


def revisit_policy_audit(
    events: DataFrame,
    page_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Uniform- vs proportional-allocation freshness audit (Cho &
    Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
    ACM TODS 28(4) 2003, §4).

    Treat each entity's events as Poisson content changes with rate
    λ_i = n_i / T (T = global observation window in days).  A crawler
    with total revisit budget B = Σ λ_i visits/day allocates it either

    * **uniform**      f_i = B / n_pages            (same cadence for all)
    * **proportional** f_i = λ_i                    (chase the churners)

    and the expected time-average freshness of page i under Poisson
    changes with periodic revisits every 1/f_i days is the paper's
    closed form  F(λ, f) = (f/λ)(1 − e^{−λ/f}).  The audit returns one
    row per policy with the corpus mean and minimum freshness — the
    TODS headline being that uniform dominates proportional for any
    change-rate distribution (proportional starves mid-rate pages to
    chase pages too hot to ever keep fresh).

    Scale shape: one count aggregate per page, one broadcastable 1-row
    global (T, B, n_pages), one projection, one 2-group aggregate — no
    windows, no self-joins, no driver state.
    """
    per_page = events.groupBy(F.col(page_col).alias("page")).agg(
        F.count(F.lit(1)).alias("n_changes")
    )
    window = events.agg(
        (
            (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
            / F.lit(86400.0)
        ).alias("t_days")
    )
    rates = per_page.crossJoin(F.broadcast(window)).select(
        "page", (F.col("n_changes") / F.col("t_days")).alias("lam")
    )
    globals_ = rates.agg(
        F.sum("lam").alias("budget"), F.count(F.lit(1)).alias("n_pages")
    )

    def fresh(f: F.Column) -> F.Column:
        return (f / F.col("lam")) * (1.0 - F.exp(-F.col("lam") / f))

    per_policy = rates.crossJoin(F.broadcast(globals_)).select(
        "page",
        fresh(F.col("budget") / F.col("n_pages")).alias("uniform"),
        fresh(F.col("lam")).alias("proportional"),
    )
    unpivoted = per_policy.selectExpr(
        "page",
        "stack(2, 'uniform', uniform, 'proportional', proportional) "
        "AS (policy, freshness)",
    )
    return (
        unpivoted.groupBy("policy")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.round(F.avg("freshness"), round_digits).alias("mean_freshness"),
            F.round(F.min("freshness"), round_digits).alias("min_freshness"),
        )
        .orderBy(F.desc("mean_freshness"), "policy")
    )


def lastmod_trust_audit(
    entries: DataFrame,
    host_col: str = "host",
    lastmod_col: str = "lastmod",
) -> DataFrame:
    """Sitemap ``<lastmod>`` trustworthiness audit.

    Search engines state they use lastmod only "if it's consistently
    and verifiably accurate" — a sitemap where every URL carries the
    same (or an always-now) date is a generator artifact, and the
    right crawler response is to ignore the field and fall back to
    measured change rates (``change_rates`` above).  The tell is
    distributional: per host, the share of entries carrying the
    modal date.  all_same (one date across many URLs) is the
    canonical untrustworthy pattern.

    Per host: (host, n_entries, n_distinct, modal_count, all_same,
    suspicious) — the modal share is modal_count / n_entries; only
    the exact integer count is emitted (and ``suspicious`` compares
    5 * modal_count > 4 * n_entries in integers), so the audit
    hashes identically on every engine.
    """
    per_date = entries.groupBy(
        F.col(host_col).alias("host"),
        F.col(lastmod_col).alias("lm"),
    ).agg(F.count(F.lit(1)).alias("c"))
    g = per_date.groupBy("host").agg(
        F.sum("c").alias("n_entries"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("modal"),
    )
    all_same = (F.col("n_distinct") == 1) & (F.col("n_entries") > 1)
    # modal_share > 0.8 done in exact integer arithmetic
    high_modal = (
        F.col("modal") * F.lit(5) > F.col("n_entries") * F.lit(4)
    )
    return g.select(
        "host",
        "n_entries",
        "n_distinct",
        F.col("modal").alias("modal_count"),
        all_same.alias("all_same"),
        (
            all_same | high_modal & (F.col("n_entries") > 4)
        ).alias("suspicious"),
    )
