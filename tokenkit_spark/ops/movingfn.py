"""Sliding-window smoothing over calendar bucket series — the
Elasticsearch ``moving_fn`` pipeline aggregation with the ``ewma`` and
``holt`` model functions.

ES runs ``moving_fn`` over a date_histogram's bucket values with a
trailing window that (at the default ``shift=0``) EXCLUDES the current
bucket, and its ``MovingFunctions.ewma`` seeds the running average with
the first value in the window, then folds ``avg = alpha*v +
(1-alpha)*avg`` over the rest.  ``holt`` is double-exponential
smoothing (Holt, "Forecasting seasonals and trends by exponentially
weighted moving averages", 1957; Hyndman & Athanasopoulos FPP §7.2):

    l_t = alpha*v_t + (1-alpha)*(l_{t-1} + b_{t-1})
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

initialized here with l_1 = v_1, b_1 = 0 (the pinned convention shared
with the SQL oracle), reporting the one-step-ahead forecast l + b.

Both are *ordered folds*, which stay fully declarative: the trailing
window materializes as a bounded array (window size, never row count)
and ``F.aggregate`` — Catalyst's higher-order fold — runs the
recurrence JVM-side.  No UDFs, no driver state; series parallelize on
the group key and buckets are zero-filled calendar days (min_doc_count
= 0 — empty buckets participate, per the ES contract; see
ops/changepoint.py for the shared bucket builder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.ops.changepoint import daily_buckets_zero_filled


def _trailing_vals(window: int):
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(-window, -1)
    )
    return F.collect_list(F.col("n").cast("double")).over(w)


def _ewma_fold(vals, alpha: float):
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    return F.when(
        F.size(vals) > 0,
        F.aggregate(
            rest,
            F.element_at(vals, 1),
            lambda acc, x: F.lit(float(alpha)) * x
            + F.lit(1.0 - alpha) * acc,
        ),
    )


def _holt_fold(vals, alpha: float, beta: float):
    a, b = F.lit(float(alpha)), F.lit(float(beta))
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    init = F.struct(
        F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
    )

    def step(acc, x):
        l_new = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (b * (l_new - acc["l"]) + (F.lit(1.0) - b) * acc["b"]).alias(
                "b"
            ),
        )

    fin = F.aggregate(rest, init, step)
    return F.when(F.size(vals) > 0, fin["l"] + fin["b"])


def moving_fn(
    events: DataFrame,
    window: int = 5,
    alpha: float = 0.3,
    beta: float = 0.1,
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """One row per (group, calendar day): the bucket count plus the
    EWMA and Holt smoothings of the TRAILING ``window`` buckets
    (current bucket excluded — ES shift=0).  The first bucket of each
    series has an empty window and NULL smoothings, like ES."""
    b = daily_buckets_zero_filled(events, group_col, ts_col)
    vals = _trailing_vals(window)
    out = b.select(
        F.col("grp").alias(group_col),
        "day",
        "n",
        F.round(_ewma_fold(vals, alpha), round_digits).alias("ewma"),
        F.round(_holt_fold(vals, alpha, beta), round_digits).alias("holt"),
    )
    return out


HW_ALPHA, HW_BETA, HW_GAMMA, HW_SEASON = 0.3, 0.1, 0.2, 7


def holt_winters_fit(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) over the
    zero-filled daily series — level, trend, and a 7-day seasonal
    profile per group.

    Holt (1957) / Winters (Management Science 1960), the additive
    form ES exposes through ``moving_fn`` holtWinters:

        l_t = a (x_t - s_{t-m}) + (1-a)(l_{t-1} + b_{t-1})
        b_t = B (l_t - l_{t-1}) + (1-B) b_{t-1}
        s_t = G (x_t - l_t) + (1-G) s_{t-m}

    computed as ONE ordered fold per group (the ``F.aggregate`` /
    list_reduce shape of the ewma/holt aggs above) with the
    accumulator [l, b, s_1..s_m] ROTATED each step — the seasonal
    slot due next always sits at position 3.  l_t is expanded inline
    wherever referenced (same workaround as the holt agg: DuckDB's
    fold must not read a just-written accumulator field).  Zero
    initialization; the fold burns in over the series the same way
    on both engines, so outputs are bit-identical.

    One row per group: (grp, n_days, level, trend, season_1..
    season_7, forecast_1, forecast_2, forecast_3) — forecast_h =
    level + h*trend + the h-th upcoming seasonal.
    """
    a, bta, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_SEASON
    days = events.groupBy(
        F.col(group_col).alias("grp"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    span = days.groupBy("grp").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "grp",
        F.explode(
            F.sequence(
                F.col("d0"), F.col("d1"),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    filled = cal.join(days, ["grp", "day"], "left").na.fill({"n": 0})
    series = filled.groupBy("grp").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("day", "n"))
            ),
            lambda s: s["n"].cast("double"),
        ).alias("xs")
    )

    def el(acc, i):
        return F.element_at(acc, i)

    def lp(acc, x):
        return a * (x - el(acc, 3)) + (1 - a) * (
            el(acc, 1) + el(acc, 2)
        )

    def step(acc, x):
        return F.array(
            lp(acc, x),
            bta * (lp(acc, x) - el(acc, 1)) + (1 - bta) * el(acc, 2),
            el(acc, 4), el(acc, 5), el(acc, 6), el(acc, 7),
            el(acc, 8), el(acc, 9),
            g * (x - lp(acc, x)) + (1 - g) * el(acc, 3),
        )

    init = F.array(*[F.lit(0.0) for _ in range(m + 2)])
    fitted = series.select(
        "grp",
        F.size("xs").alias("n_days"),
        F.aggregate(F.col("xs"), init, step).alias("acc"),
    )
    cols = [
        "grp",
        "n_days",
        F.round(F.element_at("acc", 1), round_digits).alias("level"),
        F.round(F.element_at("acc", 2), round_digits).alias("trend"),
    ]
    for i in range(m):
        cols.append(
            F.round(F.element_at("acc", 3 + i), round_digits).alias(
                f"season_{i + 1}"
            )
        )
    for h in (1, 2, 3):
        cols.append(
            F.round(
                F.element_at("acc", 1)
                + h * F.element_at("acc", 2)
                + F.element_at("acc", 2 + h),
                round_digits,
            ).alias(f"forecast_{h}")
        )
    return fitted.select(*cols)
