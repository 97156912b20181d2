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


def shewhart_rules(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Individuals control chart with the Western Electric run rules.

    Shewhart (1931) individuals/moving-range chart with the Western
    Electric Statistical Quality Control Handbook (1956) zone tests,
    over the daily count series per group.  Center line = series mean;
    sigma from the average moving range, sigma = MR-bar / d2 with
    d2 = 1.128 (n=2 subgroups) — the robust-to-trend dispersion
    estimate every SPC implementation uses.  Rules flagged per day:

        r1: the point is beyond 3 sigma
        r2: 2 of 3 consecutive points beyond 2 sigma, same side
        r3: 4 of 5 consecutive points beyond 1 sigma, same side
        r4: 8 consecutive points on the same side of the center

    All four are lag-window expressions over the ordered daily series
    — no recursion, so Spark and the SQL oracle compute identical
    flags.  Returns one row per (group, day) with the z-score and the
    four rule flags plus ``any_signal``.

    Scale shape: the series is one row per (group, day); the windows
    are per-group ordered with bounded frames (<= 7 lags).
    """
    d = events.groupBy(
        F.col(group_col).alias("grp"),
        F.datediff(
            F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    wo = Window.partitionBy("grp").orderBy("day")
    mr = F.abs(F.col("y") - F.lag("y").over(wo))
    d2 = d.withColumn("mr", mr)
    stats = d2.groupBy("grp").agg(
        F.avg("y").alias("center"),
        (F.avg("mr") / F.lit(1.128)).alias("sigma"),
    )
    z = (F.col("y") - F.col("center")) / F.col("sigma")
    based = (
        d2.join(stats, "grp")
        .withColumn("z", z)
        .withColumn("side", F.signum(F.col("z")))
    )

    def lagged(col, i):
        return F.lag(col, i).over(wo)

    def last_n_sum(expr, n):
        # sum of expr over the last n points (incl. current), partial
        # windows padded with 0 — zone tests need the full run anyway
        total = expr
        for i in range(1, n):
            total = total + F.coalesce(lagged(expr, i), F.lit(0))
        return total

    # one-sided zone indicators: the Western Electric tests require the
    # violating points to sit on the SAME side of the center line
    up2 = (F.col("z") > 2).cast("int")
    dn2 = (F.col("z") < -2).cast("int")
    up1 = (F.col("z") > 1).cast("int")
    dn1 = (F.col("z") < -1).cast("int")
    same_side_run_ok = F.col("side") != 0
    for i in range(1, 8):
        same_side_run_ok = same_side_run_ok & (
            F.coalesce(lagged(F.col("side"), i), F.lit(0.0))
            == F.col("side")
        )
    flags = (
        based.withColumn("r1", (F.abs(F.col("z")) > 3))
        .withColumn(
            "r2",
            ((last_n_sum(up2, 3) >= 2) & (up2 == 1))
            | ((last_n_sum(dn2, 3) >= 2) & (dn2 == 1)),
        )
        .withColumn(
            "r3",
            ((last_n_sum(up1, 5) >= 4) & (up1 == 1))
            | ((last_n_sum(dn1, 5) >= 4) & (dn1 == 1)),
        )
        .withColumn("r4", same_side_run_ok)
    )
    return flags.select(
        "grp",
        "day",
        F.col("y").cast("long").alias("y"),
        F.round("z", round_digits).alias("z"),
        "r1",
        "r2",
        "r3",
        "r4",
        (F.col("r1") | F.col("r2") | F.col("r3") | F.col("r4")).alias(
            "any_signal"
        ),
    )


def adtributor(
    events: DataFrame,
    split_ts: str,
    dimensions=("event_type",),
    teep: float = 0.1,
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Adtributor — dimensional root-cause attribution of a metric
    change between two periods.

    Bhagwan et al., "Adtributor: revenue debugging in advertising
    systems" (NSDI 2014): when a KPI moves between period A and B,
    rank candidate explanations (dimension values) by

        surprise  = JS divergence between the value's share of the
                    metric in A vs B (how unexpectedly it moved)
        EP        = (m_B(v) - m_A(v)) / (M_B - M_A)  (explanatory
                    power: its share of the total delta)

    keeping values with |EP| above ``teep``.  Deterministic, purely
    relational — per dimension one share rollup and a projection; the
    JS term uses the standard 0.5*(p ln(2p/(p+q)) + q ln(2q/(p+q)))
    closed form with zero-share guards.

    Per (dimension, value): (dimension, value, m_pre, m_post, p, q,
    ep, surprise, candidate).  Metric = event count.
    """
    split = F.lit(split_ts).cast("timestamp")
    base = events.select(
        *[F.col(d) for d in dimensions],
        F.when(F.col(ts_col) < split, "pre").otherwise("post").alias(
            "period"
        ),
    )
    tot = base.groupBy("period").agg(F.count(F.lit(1)).alias("m"))
    tots = {r.period: float(r.m) for r in tot.collect()}
    m_pre_t, m_post_t = tots.get("pre", 0.0), tots.get("post", 0.0)
    delta = m_post_t - m_pre_t
    out = None
    for dim in dimensions:
        per = (
            base.groupBy(F.col(dim).alias("value"), "period")
            .agg(F.count(F.lit(1)).alias("m"))
            .groupBy("value")
            .agg(
                F.sum(
                    F.when(F.col("period") == "pre", F.col("m"))
                ).alias("m_pre"),
                F.sum(
                    F.when(F.col("period") == "post", F.col("m"))
                ).alias("m_post"),
            )
            .na.fill({"m_pre": 0, "m_post": 0})
        )
        p = F.col("m_pre") / F.lit(m_pre_t)
        q = F.col("m_post") / F.lit(m_post_t)

        def js_term(a, b):
            return F.when(
                a > 0, 0.5 * a * F.log(2.0 * a / (a + b))
            ).otherwise(F.lit(0.0))

        surprise = js_term(p, q) + js_term(q, p)
        ep = (
            (F.col("m_post") - F.col("m_pre")) / F.lit(delta)
            if delta != 0
            else F.lit(0.0)
        )
        row = per.select(
            F.lit(dim).alias("dimension"),
            F.col("value").cast("string").alias("value"),
            F.col("m_pre").cast("long").alias("m_pre"),
            F.col("m_post").cast("long").alias("m_post"),
            F.round(p, round_digits).alias("p"),
            F.round(q, round_digits).alias("q"),
            F.round(ep, round_digits).alias("ep"),
            F.round(surprise, round_digits).alias("surprise"),
            (F.abs(ep) >= teep).alias("candidate"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def trend_break_fit(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Segmented (broken-stick) trend fit at the CUSUM change point.

    The composition every incident review runs: ``change_points``
    locates WHERE the daily series shifts; this fits separate OLS
    trends BEFORE and AFTER that day (piecewise linear with a known
    breakpoint — the identifiable special case of segmented
    regression, Muggeo, Stat. Med. 2003) and reports the slope change
    — "were we growing 2/day and now 9/day, or did the level jump
    with the trend intact?", which the change-point statistic alone
    cannot answer.

    Per group: (event_type, change_day, slope_before, slope_after,
    slope_delta, n_before, n_after).  Both fits are closed-form OLS
    over the zero-filled buckets (covar_pop/var_pop — the shared
    engine aggregates of ``heaps_fit``).
    """
    cp = change_points(events, group_col, ts_col).select(
        F.col("event_type").alias("grp"), "change_day"
    )
    b = daily_buckets_zero_filled(events, group_col, ts_col)
    j = b.join(cp, "grp").withColumn(
        "seg",
        F.when(F.col("day") < F.col("change_day"), "before").otherwise(
            "after"
        ),
    ).select(
        "grp",
        "change_day",
        "seg",
        F.datediff(
            F.col("day"), F.lit("1970-01-01").cast("date")
        ).cast("double").alias("x"),
        F.col("n").cast("double").alias("y"),
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    per = j.groupBy("grp", "change_day", "seg").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.when(F.var_pop("x") > 0, slope).alias("m"),
    )
    wide = per.groupBy("grp", "change_day").agg(
        F.max(F.when(F.col("seg") == "before", F.col("m"))).alias(
            "slope_before_raw"
        ),
        F.max(F.when(F.col("seg") == "after", F.col("m"))).alias(
            "slope_after_raw"
        ),
        F.max(
            F.when(F.col("seg") == "before", F.col("n_pts"))
        ).alias("n_before"),
        F.max(
            F.when(F.col("seg") == "after", F.col("n_pts"))
        ).alias("n_after"),
    )
    return wide.select(
        F.col("grp").alias("event_type"),
        F.col("change_day").cast("string").alias("change_day"),
        F.round("slope_before_raw", round_digits).alias(
            "slope_before"
        ),
        F.round("slope_after_raw", round_digits).alias("slope_after"),
        F.round(
            F.col("slope_after_raw") - F.col("slope_before_raw"),
            round_digits,
        ).alias("slope_delta"),
        "n_before",
        "n_after",
    )


MAD_Z_CONST = 0.6745
MAD_Z_THRESHOLD = 3.5


def robust_zscore_daily(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Median/MAD anomaly days — the outlier screen outliers can't
    poison.

    Shewhart-style mean/sigma rules (``shewhart_rules`` above) break
    exactly when needed most: one huge day inflates sigma and hides
    itself.  The Iglewicz-Hoaglin modified z-score 0.6745 (x - med) /
    MAD is the standard robust replacement with the canonical 3.5
    flag threshold — 50% breakdown point instead of 0%.  Per
    (event_type, day): the daily count, its modified z, and the
    flag; MAD = 0 (constant series) yields null z, never a division
    error.

    Per (etype, day): (etype, day, n_events, med, mad, robust_z,
    is_anomaly).
    """
    daily = (
        events.groupBy(
            F.col(type_col).alias("etype"),
            F.to_date(F.col(ts_col)).cast("string").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    med = daily.groupBy("etype").agg(
        F.percentile(F.col("n_events").cast("double"), F.lit(0.5)).alias(
            "med"
        )
    )
    dev = daily.join(med, "etype").withColumn(
        "adev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = dev.groupBy("etype").agg(
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad")
    )
    z = F.when(
        F.col("mad") != 0,
        F.lit(MAD_Z_CONST)
        * (F.col("n_events") - F.col("med"))
        / F.col("mad"),
    )
    return (
        dev.join(mad, "etype")
        .select(
            "etype",
            "day",
            "n_events",
            F.round("med", round_digits).alias("med"),
            F.round("mad", round_digits).alias("mad"),
            F.round(z, round_digits).alias("robust_z"),
            (
                F.coalesce(F.abs(z), F.lit(0.0)) > MAD_Z_THRESHOLD
            ).alias("is_anomaly"),
        )
    )
