"""Change-point detection over calendar-bucketed event series.

The CUSUM mean-shift statistic (Page, "Continuous inspection schemes",
Biometrika 1954): for a series x_1..x_n with total S_n, the centered
cumulative deviation D_t = S_t - (t/n)·S_n peaks at the point where
the mean shifts; |D| normalized by the series scale is the classic
offline change-point test.  Elasticsearch ships the same idea as the
``change_point`` aggregation (8.x, ML aggs) over a date_histogram's
bucket series; this module is that shape — per-group daily buckets,
zero-filled, one change point + statistic per group.

Determinism contract for the SQL oracle: buckets are calendar days
zero-filled over each group's [min, max] span (min_doc_count=0, the
same convention as ``ops/events.py:date_histogram_pipeline``), the
change point is argmax of |D_t| over interior candidates t in
[1, n-1], ties broken toward the EARLIEST bucket, and the reported
statistic is |D_t| / (1 + stddev_pop of the series) rounded to 6 dp —
a scale-normalized score that never divides by zero on constant
series.

Scale shape: one groupBy-day count (map-side partials), a per-group
``sequence`` zero-fill join (bucket count per group is bounded by the
calendar span, not the event count), two window passes keyed by group
(cumsum + argmax) — no UDFs, no collect; groups parallelize and the
per-group window is over day-bucket rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_buckets_zero_filled(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(group, day, n) with every calendar day in each group's
    [min(day), max(day)] present (n = 0 where no events landed)."""
    days = events.select(
        F.col(group_col).alias("grp"),
        F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
    ).groupBy("grp", "day").agg(F.count("*").alias("n"))
    span = days.groupBy("grp").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        "grp",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    return (
        calendar.join(days, ["grp", "day"], "left")
        .select("grp", "day", F.coalesce("n", F.lit(0)).alias("n"))
    )


def change_points(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """One row per group: (event_type, change_day, statistic,
    mean_before, mean_after, n_buckets).  ``change_day`` is the first
    day of the AFTER segment (the CUSUM argmax t is the last index of
    the before segment)."""
    b = daily_buckets_zero_filled(events, group_col, ts_col)
    wg = Window.partitionBy("grp")
    wcum = wg.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        b.withColumn("t", F.row_number().over(wg.orderBy("day")))
        .withColumn("n_buckets", F.count("*").over(wg))
        .withColumn("s_t", F.sum("n").over(wcum))
        .withColumn("s_n", F.sum("n").over(wg))
        .withColumn("sd", F.stddev_pop("n").over(wg))
        .withColumn(
            "dev",
            F.abs(
                F.col("s_t")
                - F.col("t") / F.col("n_buckets") * F.col("s_n")
            ),
        )
    )
    interior = scored.filter(F.col("t") < F.col("n_buckets"))
    pick = Window.partitionBy("grp").orderBy(
        F.col("dev").desc(), F.col("day").asc()
    )
    best = interior.withColumn("__r", F.row_number().over(pick)).filter(
        F.col("__r") == 1
    )
    chosen = best.select(
        "grp",
        F.col("t").alias("t_star"),
        F.round(F.col("dev") / (1 + F.col("sd")), round_digits).alias(
            "statistic"
        ),
        "n_buckets",
    )
    seg = (
        b.withColumn("t", F.row_number().over(wg.orderBy("day")))
        .join(chosen, "grp")
        .withColumn("side", F.when(F.col("t") <= F.col("t_star"), 1).otherwise(2))
    )
    means = seg.groupBy("grp", "statistic", "n_buckets").agg(
        F.round(
            F.avg(F.when(F.col("side") == 1, F.col("n"))), round_digits
        ).alias("mean_before"),
        F.round(
            F.avg(F.when(F.col("side") == 2, F.col("n"))), round_digits
        ).alias("mean_after"),
        F.min(
            F.when(F.col("side") == 2, F.col("day"))
        ).alias("change_day"),
    )
    return means.select(
        F.col("grp").alias("event_type"),
        "change_day",
        "statistic",
        "mean_before",
        "mean_after",
        "n_buckets",
    ).orderBy("event_type")


def bucket_correlation(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """ES ``bucket_correlation`` pipeline shape (count_correlation):
    Pearson r between each group's daily count series and the
    all-groups daily total series, over the GLOBAL zero-filled
    calendar (so every group's series is the same length as the
    indicator).  Output: (event_type, r, n_buckets)."""
    days = events.select(
        F.col(group_col).alias("grp"),
        F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
    ).groupBy("grp", "day").agg(F.count("*").alias("n"))
    span = days.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    calendar = span.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day")
    )
    total = days.groupBy("day").agg(F.sum("n").alias("total"))
    grid = (
        calendar.crossJoin(days.select("grp").distinct())
        .join(days, ["grp", "day"], "left")
        .join(total, "day", "left")
        .select(
            "grp",
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0)).alias("total"),
        )
    )
    return (
        grid.groupBy("grp")
        .agg(
            F.round(F.corr("n", "total"), round_digits).alias("r"),
            F.count("*").alias("n_buckets"),
        )
        .select(F.col("grp").alias("event_type"), "r", "n_buckets")
        .orderBy("event_type")
    )
