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
