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


def logrank_test(
    events: DataFrame,
    censor_margin_days: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    chi2_crit_1df: float = 3.841,
    round_digits: int = 6,
) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing the two arms' survival.

    Mantel (Cancer Chemotherapy Reports 1966) / Peto & Peto (JRSS-A
    1972): at each distinct event time t with n_i at risk and d_i
    deaths in arm i,

        E_1(t)  = d(t) * n_1(t) / n(t)
        V(t)    = d n_1 n_0 (n - d) / (n^2 (n - 1))
        chi2    = (sum(d_1 - E_1))^2 / sum(V)   ~ chi2(1) under H0

    — THE standard test for "are these two Kaplan-Meier curves the
    same process", censoring handled exactly as in ``kaplan_meier``
    (the per-arm lifetimes and censor rule are shared).  Arms are the
    pinned user parity.

    One row: (n_users_0, n_users_1, observed_1, expected_1, chi2,
    significant).  Shape: the per-time risk sets come from
    descending-cumulative windows over the tiny lifetime table.
    """
    from pyspark.sql import Window

    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
    )
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(day).alias("first_d"), F.max(day).alias("last_d")
    )
    horizon = events.agg(F.max(day).alias("end_d"))
    lives = per_user.crossJoin(F.broadcast(horizon)).select(
        (F.col("u") % 2).cast("int").alias("arm"),
        (F.col("last_d") - F.col("first_d") + 1).alias("t"),
        (
            F.col("last_d") >= F.col("end_d") - censor_margin_days
        ).alias("censored"),
    )
    per_t = lives.groupBy("t").agg(
        F.sum(
            (~F.col("censored") & (F.col("arm") == 1)).cast("long")
        ).alias("d1"),
        F.sum(
            (~F.col("censored") & (F.col("arm") == 0)).cast("long")
        ).alias("d0"),
        F.sum((F.col("arm") == 1).cast("long")).alias("m1"),
        F.sum((F.col("arm") == 0).cast("long")).alias("m0"),
    )
    w_after = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = per_t.withColumn(
        "n1", F.sum("m1").over(w_after)
    ).withColumn("n0", F.sum("m0").over(w_after))
    d = (F.col("d0") + F.col("d1")).cast("double")
    n1 = F.col("n1").cast("double")
    n0 = F.col("n0").cast("double")
    n = n1 + n0
    e1 = d * n1 / n
    v = F.when(
        n > 1,
        d * n1 * n0 * (n - d) / (n * n * (n - 1)),
    ).otherwise(F.lit(0.0))
    agg = risk.filter(d > 0).agg(
        F.sum("d1").alias("obs1"),
        F.sum(e1).alias("exp1"),
        F.sum(v).alias("var"),
    )
    arms = lives.groupBy("arm").agg(F.count(F.lit(1)).alias("nu"))
    au = {r.arm: r.nu for r in arms.collect()}
    r = agg.collect()[0]
    chi2 = (
        (r.obs1 - r.exp1) ** 2 / r.var if r.var and r.var > 0 else 0.0
    )
    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (
                au.get(0, 0),
                au.get(1, 0),
                int(r.obs1 or 0),
                round(float(r.exp1 or 0.0), round_digits),
                round(float(chi2), round_digits),
                bool(chi2 > chi2_crit_1df),
            )
        ],
        "n_users_0 long, n_users_1 long, observed_1 long, "
        "expected_1 double, chi2 double, significant boolean",
    )
