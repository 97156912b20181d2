"""Kaplan-Meier survival estimation of user lifetimes — retention as
a survival curve with right-censoring handled honestly.

Kaplan & Meier, "Nonparametric estimation from incomplete
observations" (JASA 1958): with event times t_1 < t_2 < ..., d_i
deaths at t_i and n_i subjects at risk just before t_i,

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

The estimator's whole point is RIGHT-CENSORING: a user still active
at the end of the observation window contributes to the at-risk
denominators for as long as observed, but never to a death count —
naive retention curves (``ops/events.py:retention_cohorts`` counts
observed returns) systematically understate the survival of recent
cohorts; KM does not.  Lifetime here = span in days from a user's
first to last event + 1; a user whose last event falls within
``censor_margin_days`` of the corpus's last day is censored (they may
still be alive).

The product is computed as exp(cumsum(ln(1 - d/n))) over the ordered
lifetimes — one window pass, and the same expression in the DuckDB
oracle is bit-identical because the cumulative order is pinned.

Returns one row per distinct observed lifetime t: (t_days, n_risk,
n_events, n_censored, survival).

Scale shape: per-user rollup -> per-lifetime rollup (rows = distinct
lifetimes, tiny) -> one ordered window.  Nothing user-level crosses
the second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    events: DataFrame,
    censor_margin_days: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    round_digits: int = 6,
) -> DataFrame:
    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
    )
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(day).alias("first_d"), F.max(day).alias("last_d")
    )
    horizon = events.agg(F.max(day).alias("end_d"))
    lives = per_user.crossJoin(F.broadcast(horizon)).select(
        (F.col("last_d") - F.col("first_d") + 1).alias("t"),
        (
            F.col("last_d") >= F.col("end_d") - censor_margin_days
        ).alias("censored"),
    )
    per_t = lives.groupBy("t").agg(
        F.sum((~F.col("censored")).cast("long")).alias("n_events"),
        F.sum(F.col("censored").cast("long")).alias("n_censored"),
        F.count(F.lit(1)).alias("n_t"),
    )
    w_after = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    at_risk = per_t.withColumn("n_risk", F.sum("n_t").over(w_after))
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # a factor of exactly 0 (everyone at risk dies — only possible at
    # the largest t) would be ln(0); flag it and pin survival to 0
    factor = (
        1.0 - F.col("n_events") / F.col("n_risk").cast("double")
    )
    surv = (
        at_risk.withColumn("factor", factor)
        .withColumn(
            "hit_zero",
            F.max((F.col("factor") == 0).cast("int")).over(w_cum),
        )
        .withColumn(
            "survival_raw",
            F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("factor") > 0, F.log("factor")
                        ).otherwise(F.lit(0.0))
                    ).over(w_cum)
                )
            ),
        )
    )
    return surv.select(
        F.col("t").alias("t_days"),
        "n_risk",
        "n_events",
        "n_censored",
        F.round("survival_raw", round_digits).alias("survival"),
    )
