"""Event-stream analytics: sessionization, date-histogram aggregation,
and approximate cardinality.

These are the aggregation surfaces a crawl/telemetry pipeline runs next
to the fulltext index (the reference's host application is a search
stack over event-producing crawls; ES exposes the same three as
session-ish transforms, the ``date_histogram`` agg, and the
``cardinality`` agg).

Scale notes (the reason each shape was chosen):

* ``sessionize`` shuffles once on the entity key and then runs two
  window passes over each entity's ordered events — per-entity data is
  the unit of work, so 1000 executors each own a slice of the entity
  space.  Power-user skew is bounded by the entity's own event count,
  never by the corpus; a single pathological entity can be capped
  upstream with a ``filter`` on a pre-aggregated count.
* ``date_histogram`` is a pure hash aggregate with map-side partials —
  the bucket expression (``date_trunc``) is evaluated JVM-side inside
  whole-stage codegen, so the shuffle carries one row per
  (bucket, group) per map task, not per event.
* ``cardinality`` uses Spark's HyperLogLog++ (``approx_count_distinct``)
  — sketches merge associatively, so the shuffle carries fixed-size
  sketch bytes instead of the distinct-value set.  This is the only way
  a distinct-count over 10^12 events stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVALS = ("year", "quarter", "month", "week", "day", "hour", "minute")


def _epoch_us(df: DataFrame, ts_col: str):
    """Epoch microseconds, correct for BOTH timestamp flavors:

    * TIMESTAMP (an instant): ``unix_micros`` directly — calendar fields
      would re-derive session-local wall time, which is non-monotonic
      across DST transitions and would corrupt gap arithmetic.
    * TIMESTAMP_NTZ (a wall time): built from calendar fields, which for
      NTZ are timezone-free — ``unix_micros`` rejects NTZ, and casting
      NTZ->TIMESTAMP would reinterpret the wall time in the session
      zone.  Matches DuckDB's ``epoch_us(ts)`` bit-for-bit on the same
      parquet."""
    c = F.col(ts_col)
    if df.schema[ts_col].dataType.typeName() == "timestamp":
        return F.unix_micros(c)
    frac_us = F.round(
        F.expr(f"extract(SECOND FROM {ts_col})") * 1_000_000
    ).cast("long")
    return (
        F.unix_date(F.to_date(c)).cast("long") * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
    ) * 1_000_000 + frac_us


def sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Assign gap-based session ids: a new session starts whenever the
    entity's inter-event gap exceeds ``gap_minutes``.

    Returns the input rows plus ``session_id`` (0-based per entity,
    in event order).  ``order_cols`` breaks timestamp ties so the
    assignment is deterministic.
    """
    if gap_minutes <= 0:
        raise ValueError("sessionize: gap_minutes must be > 0")
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(entity_col).orderBy(*order)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    us = _epoch_us(events, ts_col)
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    running = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_id", (F.sum(is_new).over(running) - F.lit(1)).cast("long")
    )


def session_stats(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = None,
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output: event
    count, start/end (epoch microseconds), duration, and optionally the
    summed ``value_col`` (rounded to 4 digits so ranking/comparison is
    float-order independent)."""
    s = sessionize(events, entity_col, ts_col, gap_minutes, order_cols)
    us = _epoch_us(s, ts_col)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return s.groupBy(entity_col, "session_id").agg(*aggs)


def date_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    interval: str = "day",
    group_cols: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """ES ``date_histogram`` aggregation: calendar-truncated buckets with
    per-bucket doc counts (and an optional value-sum sub-aggregation).

    The bucket is formatted as a string (``yyyy-MM-dd HH:mm:ss``) so the
    result is engine-portable."""
    if interval not in _INTERVALS:
        raise ValueError(f"date_histogram: unknown interval {interval!r}")
    bucket = F.date_format(
        F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
    ).alias("bucket")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return events.groupBy(bucket, *[F.col(c) for c in group_cols]).agg(*aggs)


def extended_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """ES ``extended_stats`` aggregation: count / min / max / sum / avg /
    std-dev per group — one hash aggregate with map-side partials (every
    moment is a partial-aggregable sum).

    ``std_v`` is the POPULATION standard deviation: Elasticsearch derives
    it as sqrt(sum_of_squares/count - avg^2), i.e. the population form,
    so ``stddev_pop`` (not ``stddev_samp``) is the contract-faithful
    choice — they diverge visibly on small groups."""
    v = F.col(value_col)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(v), round_digits).alias("min_v"),
        F.round(F.max(v), round_digits).alias("max_v"),
        F.round(F.sum(v), round_digits).alias("sum_v"),
        F.round(F.avg(v), round_digits).alias("avg_v"),
        F.round(F.stddev_pop(v), round_digits).alias("std_v"),
    )


def date_histogram_pipeline(
    events: DataFrame,
    ts_col: str = "ts",
    interval: str = "day",
    value_col: str | None = None,
    window: int = 3,
) -> DataFrame:
    """ES pipeline aggregations over a date_histogram: per bucket the
    ``window``-bucket moving average (``moving_fn`` with the default
    ``shift=0`` — the window is the ``window`` buckets BEFORE the current
    one, current excluded; NULL while the window is empty) and the first
    difference vs the previous bucket (``derivative``, NULL for the
    first bucket — the ES contract).

    Empty calendar buckets are zero-filled first (``min_doc_count=0``):
    ES emits every calendar bucket between the first and last occupied
    one, and pipeline aggs run over that full gap-free sequence — a
    moving average computed across a gap would silently span
    non-adjacent periods.

    Scale shape: the bucketed histogram is tiny relative to the events
    (one row per calendar bucket), so the zero-fill join and the single
    unpartitioned ordered window over it are safe at any corpus size —
    the reduction happened in the histogram's hash aggregate, not the
    window."""
    if window <= 0:
        raise ValueError("date_histogram_pipeline: window must be > 0")
    hist = date_histogram(events, ts_col, interval, (), value_col)
    step = {
        "year": "interval 1 year",
        "quarter": "interval 3 month",
        "month": "interval 1 month",
        "week": "interval 7 day",
        "day": "interval 1 day",
        "hour": "interval 1 hour",
        "minute": "interval 1 minute",
    }[interval]
    # one row in, <=n_buckets rows out: the full calendar sequence
    # between the first and last occupied bucket
    full = (
        hist.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        )
        .select(
            F.explode(
                F.sequence(
                    F.to_timestamp("lo"), F.to_timestamp("hi"), F.expr(step)
                )
            ).alias("b")
        )
        .select(F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"))
    )
    value_cols = ["n_events"] + (["sum_value"] if value_col is not None else [])
    filled = full.join(hist, "bucket", "left").fillna(0, subset=value_cols)
    metric = F.col("sum_value") if value_col is not None else F.col("n_events")
    w = Window.orderBy("bucket")
    mov = Window.orderBy("bucket").rowsBetween(-window, -1)
    return filled.select(
        "bucket",
        *value_cols,
        F.round(F.avg(metric).over(mov), 4).alias("moving_avg"),
        F.round(metric - F.lag(metric).over(w), 4).alias("derivative"),
    )


def cardinality(
    df: DataFrame,
    group_col: str,
    target_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """ES ``cardinality`` aggregation: approximate distinct count of
    ``target_col`` per ``group_col`` via HyperLogLog++.

    ``rsd`` is the maximum relative standard deviation (ES
    ``precision_threshold`` analog).  Sketches merge associatively so
    the result is exact-shuffle-free at any scale; the trade is bounded
    relative error, tested against the exact count in the suite."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(target_col, rsd).alias("approx_distinct")
    )


def rate_agg(
    events: DataFrame,
    ts_col: str = "ts",
    bucket: str = "month",
    unit: str = "day",
    value_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """ES ``rate`` aggregation inside a date_histogram: per calendar
    bucket, the sum (of ``value_col``, else the doc count) normalized to
    a per-``unit`` rate — calendar-aware, so a *month* bucket divided to
    a *day* rate uses that month's actual length (28/29/30/31), the ES
    contract. ``unit`` must not exceed ``bucket``. One hash aggregate +
    a per-row calendar expression; engine-portable bucket strings.

    Returns (bucket, n_events, rate)."""
    pairs = {
        ("day", "hour"): F.lit(24.0),
        ("week", "day"): F.lit(7.0),
        ("week", "hour"): F.lit(168.0),
        ("month", "day"): None,  # computed from the bucket
        ("month", "hour"): None,
        ("month", "week"): None,
    }
    if (bucket, unit) not in pairs:
        raise ValueError(f"rate_agg: unsupported bucket/unit {bucket}/{unit}")
    b = F.date_trunc(bucket, F.col(ts_col))
    agg_val = (
        F.sum(value_col) if value_col is not None else F.count(F.lit(1))
    )
    out = events.groupBy(
        F.date_format(b, "yyyy-MM-dd HH:mm:ss").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"), agg_val.alias("__v")
    )
    div = pairs[(bucket, unit)]
    if div is None:
        days = F.datediff(
            F.add_months(F.to_timestamp("bucket"), 1),
            F.to_timestamp("bucket"),
        ).cast("double")
        div = {"day": days, "hour": days * 24.0, "week": days / 7.0}[unit]
    return out.select(
        "bucket",
        "n_events",
        F.round(F.col("__v") / div, round_digits).alias("rate"),
    )


def bucket_sort(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    sort_from: int = 1,
    size: int = 5,
) -> DataFrame:
    """ES ``bucket_sort`` pipeline aggregation: inside each parent
    bucket (here ``group_col``), re-sort the child date_histogram
    buckets by a metric (doc count desc, day asc as the deterministic
    tiebreak), then page with ``from``/``size`` — truncating the bucket
    list itself, not the documents (the ES contract: bucket_sort runs
    AFTER the child aggs and discards buckets outside the page).

    Scale shape: one (group, day) count aggregate, one window
    partitioned by group over bucket-count-sized data. Returns
    (event_type, day, n, bucket_rank) for ranks in
    (sort_from, sort_from + size]."""
    buckets = events.groupBy(
        F.col(group_col), F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(), F.col("day").asc())
    return (
        buckets.withColumn("bucket_rank", F.row_number().over(w).cast("long"))
        .filter(
            (F.col("bucket_rank") > sort_from)
            & (F.col("bucket_rank") <= sort_from + size)
        )
        .select(group_col, "day", "n", "bucket_rank")
    )


def downsample_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dim_col: str = "event_type",
    value_col: str = "value",
    interval: str = "hour",
    round_digits: int = 6,
) -> DataFrame:
    """ES TSDB downsampling contract (the ``_downsample`` API): roll the
    raw stream up to one document per (time bucket, dimension) carrying
    the pre-aggregated metric summary — min/max/sum/value_count for
    gauge fields plus the bucket's first/last event timestamp — so
    queries over long horizons hit the rollup index instead of raw data.

    Scale shape: ONE groupBy over (bucket, dims) — the map-side-combine
    friendly shape; at 100 TB this is the append-only incremental rollup
    job per closed time window."""
    b = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    return (
        events.groupBy(b, F.col(dim_col))
        .agg(
            F.count("*").alias("value_count"),
            F.round(F.min(value_col), round_digits).alias("v_min"),
            F.round(F.max(value_col), round_digits).alias("v_max"),
            F.round(F.sum(value_col), round_digits).alias("v_sum"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .orderBy("bucket", dim_col)
    )


def cumulative_uniques(
    events: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
) -> DataFrame:
    """Exact cumulative distinct entities per day WITHOUT rescanning
    history: an entity's first-seen day is a per-entity MIN, the day's
    new-entity count is an aggregate over that, and the running total is
    a prefix sum over day-count-sized data — the distributed exact twin
    of the HLL running-cardinality estimate (cardinality op), and the
    standard trick for "cumulative uniques over an unbounded stream"
    at 100 TB (no growing distinct state, no day-over-day rescan).
    Returns (day, dau, new_entities, cum_uniques)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    dau = events.groupBy(day).agg(
        F.countDistinct(entity_col).alias("dau")
    )
    firsts = (
        events.groupBy(entity_col)
        .agg(F.min(ts_col).alias("first_ts"))
        .groupBy(F.date_trunc("day", F.col("first_ts")).cast("date").alias("day"))
        .agg(F.count("*").alias("new_entities"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(firsts, "day", "left")
        .fillna(0, subset=["new_entities"])
        .withColumn("cum_uniques", F.sum("new_entities").over(w))
        .orderBy("day")
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    entity_col: str = "user_id",
    type_col: str = "event_type",
    round_digits: int = 4,
) -> DataFrame:
    """Ordered funnel analysis: step i counts entities whose FIRST
    qualifying step-i event strictly follows their first qualifying
    step-(i-1) event (the strict-sequence funnel contract; same-
    timestamp events do not advance the funnel). Returns one row per
    step: (step, event_type, n_entities, conversion) where conversion
    is vs the previous step (1.0 for step 1).

    Scale shape: one conditional-MIN aggregate per step over a single
    groupBy(entity) pass — no self-joins, no per-entity event sorting;
    the funnel depth is the (small) number of aggregate columns."""
    aggs = []
    for i, s in enumerate(steps):
        if i == 0:
            expr = F.min(F.when(F.col(type_col) == s, F.col(ts_col)))
        else:
            # strictly after the previous step's first qualifying time
            expr = F.min(
                F.when(
                    (F.col(type_col) == s)
                    & (F.col(ts_col) > F.col(f"__t{i - 1}")),
                    F.col(ts_col),
                )
            )
        aggs.append((f"__t{i}", expr))
    # iterative: each step's condition references the previous column,
    # so materialize one aggregation per step over the shrinking
    # qualified set (steps are few; each pass is one shuffle)
    per_entity = events.groupBy(entity_col).agg(
        aggs[0][1].alias("__t0")
    )
    for i in range(1, len(steps)):
        nxt = (
            events.join(
                per_entity.select(entity_col, f"__t{i - 1}"), entity_col
            )
            .groupBy(entity_col)
            .agg(aggs[i][1].alias(f"__t{i}"))
        )
        per_entity = per_entity.join(nxt, entity_col, "left")
    counts = per_entity.agg(
        *[
            F.count(F.col(f"__t{i}")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    ).collect()[0]
    rows = []
    prev = None
    for i, s in enumerate(steps):
        n = int(counts[f"n{i}"])
        conv = 1.0 if i == 0 else (round(n / prev, round_digits) if prev else 0.0)
        rows.append((i + 1, s, n, conv))
        prev = n
    spark = events.sparkSession
    return spark.createDataFrame(
        rows, "step long, event_type string, n_entities long, conversion double"
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
) -> DataFrame:
    """Weekly retention cohorts: an entity's cohort is the Monday-start
    week of its first event; each later active week lands at offset
    (week - cohort_week)/7 days. Returns (cohort_week, week_offset,
    n_entities) — the classic triangle. One per-entity MIN, one
    distinct (entity, week) reduce, one join on the small cohort map."""
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    firsts = events.groupBy(entity_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = events.select(
        F.col(entity_col), wk.alias("week")
    ).distinct()
    return (
        active.join(firsts, entity_col)
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct(entity_col).alias("n_entities"))
        .orderBy("cohort_week", "week_offset")
    )


def hopping_counts(
    events: DataFrame,
    width: str = "6 hours",
    slide: str = "3 hours",
    ts_col: str = "ts",
    round_digits: int = 4,
) -> DataFrame:
    """Hopping (sliding) window rollup via Spark's native ``F.window``
    — every event lands in width/slide overlapping windows (here 2),
    the streaming-unifiable twin of the tumbling date_histogram:
    (win_start_us, win_end_us, event_type, n_events, sum_value) ordered
    by (win_start_us, event_type).

    Spark aligns hop boundaries to the epoch origin, so for integral
    width/slide ratios an event at t belongs to exactly the windows
    starting at (floor(t/slide) - j) * slide for j < width/slide — the
    closed form the DuckDB oracle restates. One hash aggregate after a
    2x in-map fan-out; no self-joins, no calendar table."""
    grouped = events.groupBy(
        F.window(ts_col, width, slide).alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), round_digits).alias("sum_value"),
    )
    out = grouped.select(
        "win.start", "win.end", "event_type", "n_events", "sum_value"
    )
    return out.select(
        _epoch_us(out, "start").alias("win_start_us"),
        _epoch_us(out, "end").alias("win_end_us"),
        "event_type",
        "n_events",
        "sum_value",
    ).orderBy("win_start_us", "event_type")


def native_session_stats(
    events: DataFrame,
    gap: str = "45 minutes",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 4,
) -> DataFrame:
    """Gap-based sessions via Spark's native ``F.session_window`` — the
    API-coverage twin of ``sessionize`` (which builds the same islands
    with a lag window): one row per (entity, session) with Spark's
    session-window convention that the session END is the last event's
    timestamp plus the gap. Returns (user_id, session_start_us,
    session_end_us, n_events, sum_value) ordered by (user_id,
    session_start_us). The oracle restates the islands with a lag +
    running-flag sum and adds the gap to max(ts)."""
    grouped = events.groupBy(
        F.col(entity_col), F.session_window(ts_col, gap).alias("win")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), round_digits).alias("sum_value"),
    )
    out = grouped.select(
        entity_col, "win.start", "win.end", "n_events", "sum_value"
    )
    return out.select(
        entity_col,
        _epoch_us(out, "start").alias("session_start_us"),
        _epoch_us(out, "end").alias("session_end_us"),
        "n_events",
        "sum_value",
    ).orderBy(entity_col, "session_start_us")


def weekday_seasonality(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 4,
) -> DataFrame:
    """Weekday seasonality profile per group — the day-of-week
    traffic-shape diagnostic behind crawl scheduling and capacity
    planning (and ES's date_histogram-with-weekday-script recipe):
    for each (group, ISO weekday) the share of the group's events and
    the seasonality index share·7 (1.0 = flat week).

    The weekday is computed ARITHMETICALLY — days since 1970-01-01
    (a Thursday) shifted so Monday=1 — rather than via an engine
    day-of-week function, because Spark (1=Sunday) and DuckDB
    (0=Sunday) disagree on numbering; epoch arithmetic is identical
    everywhere.  One hash aggregate + a broadcast of the per-group
    totals; scale-free."""
    days = F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
    wd = ((days + 3) % 7) + 1
    per = events.groupBy(
        F.col(group_col).alias("grp"), wd.cast("int").alias("weekday_iso")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = per.groupBy("grp").agg(F.sum("n_events").alias("total"))
    return (
        per.join(F.broadcast(tot), "grp")
        .select(
            F.col("grp").alias(group_col),
            "weekday_iso",
            "n_events",
            F.round(F.col("n_events") / F.col("total"), round_digits).alias(
                "share"
            ),
            F.round(
                F.col("n_events") * 7.0 / F.col("total"), round_digits
            ).alias("seasonality_idx"),
        )
    )


def burn_rate_alerts(
    events: DataFrame,
    slo_error_budget: float = 0.01,
    ts_col: str = "ts",
    err_col: str = "is_error",
    round_digits: int = 4,
) -> DataFrame:
    """Multiwindow error-budget burn-rate alerting (Google SRE
    Workbook ch. 5, "Alerting on SLOs" — the 14.4x/6x two-window
    policy): with a 99%-success SLO the error budget is 1%, and

        burn(W) = error_rate(W) / budget

    PAGE when both the 1h and 5m windows burn >= 14.4x (budget gone
    in 2 days; the short window gates stale alerts), TICKET when both
    the 6h and 30m windows burn >= 6x.

    Computed EXACTLY over the event stream: per-minute error/total
    counts, the minute timeline zero-filled (missing minutes must
    count as healthy time, not be skipped — the date_histogram
    pipeline-agg lesson), rolling sums as ROWS-frame windows over the
    minute stream.  The windows are over the BUCKET stream — one row
    per minute regardless of corpus size — so the unpartitioned
    ordering is bounded by the time horizon, not the data (same
    argument as the pipeline aggs in this module).

    Output: the minutes where an alert fires: (minute_epoch, err_1h,
    total_1h, burn_1h, burn_6h, page_alert, ticket_alert)."""
    spark = events.sparkSession
    mins = events.select(
        (F.unix_timestamp(ts_col) / 60).cast("long").alias("m"),
        F.col(err_col).cast("int").alias("e"),
    )
    per = mins.groupBy("m").agg(
        F.count(F.lit(1)).alias("total"), F.sum("e").alias("err")
    )
    bounds = per.agg(
        F.min("m").alias("lo"), F.max("m").alias("hi")
    ).collect()[0]
    timeline = spark.range(bounds.lo, bounds.hi + 1).select(
        F.col("id").alias("m")
    )
    filled = (
        timeline.join(per, "m", "left")
        .select(
            "m",
            F.coalesce("total", F.lit(0)).alias("total"),
            F.coalesce("err", F.lit(0)).alias("err"),
        )
    )

    def roll(col, n):
        w = Window.orderBy("m").rowsBetween(-(n - 1), 0)
        return F.sum(col).over(w)

    def burn(err_s, tot_s):
        return F.when(tot_s > 0, (err_s / tot_s) / slo_error_budget).otherwise(
            F.lit(0.0)
        )

    r = filled.select(
        "m",
        roll(F.col("err"), 60).alias("err_1h"),
        roll(F.col("total"), 60).alias("total_1h"),
        burn(roll(F.col("err"), 60), roll(F.col("total"), 60)).alias("b1h"),
        burn(roll(F.col("err"), 5), roll(F.col("total"), 5)).alias("b5m"),
        burn(roll(F.col("err"), 360), roll(F.col("total"), 360)).alias(
            "b6h"
        ),
        burn(roll(F.col("err"), 30), roll(F.col("total"), 30)).alias(
            "b30m"
        ),
    )
    r = r.select(
        (F.col("m") * 60).cast("long").alias("minute_epoch"),
        "err_1h",
        "total_1h",
        F.round("b1h", round_digits).alias("burn_1h"),
        F.round("b6h", round_digits).alias("burn_6h"),
        ((F.col("b1h") >= 14.4) & (F.col("b5m") >= 14.4)).alias(
            "page_alert"
        ),
        ((F.col("b6h") >= 6.0) & (F.col("b30m") >= 6.0)).alias(
            "ticket_alert"
        ),
    )
    return r.filter(F.col("page_alert") | F.col("ticket_alert"))


APDEX_RATINGS = (
    (0.94, "excellent"),
    (0.85, "good"),
    (0.70, "fair"),
    (0.50, "poor"),
)


def apdex_scores(
    events: DataFrame,
    threshold_t: float = 100.0,
    latency_col: str = "value",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Apdex application-performance index per service.

    The Apdex Alliance specification (Sevcik, 2005; the
    industry-standard SLO roll-up NewRelic/Datadog expose): with
    target threshold T, a sample is SATISFIED if latency <= T,
    TOLERATING if T < latency <= 4T, FRUSTRATED beyond; the index is

        Apdex_T = (satisfied + tolerating / 2) / total

    in [0, 1], with the spec's rating bands (>= 0.94 excellent,
    >= 0.85 good, >= 0.70 fair, >= 0.50 poor, else unacceptable).
    The index deliberately compresses the latency distribution into a
    user-experience scalar — the p99-style tail audits live in
    ``index/hedging.py``; this is the complementary satisfaction
    roll-up per service.

    One projection + one hash aggregate; (grp, n, n_satisfied,
    n_tolerating, n_frustrated, apdex, rating).
    """
    v = F.col(latency_col)
    per = events.select(
        F.col(group_col).alias("grp"),
        (v <= threshold_t).cast("long").alias("sat"),
        ((v > threshold_t) & (v <= 4 * threshold_t))
        .cast("long")
        .alias("tol"),
        (v > 4 * threshold_t).cast("long").alias("fru"),
    )
    agg = per.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sat").alias("n_satisfied"),
        F.sum("tol").alias("n_tolerating"),
        F.sum("fru").alias("n_frustrated"),
    )
    apdex = (
        F.col("n_satisfied") + F.col("n_tolerating") / 2.0
    ) / F.col("n")
    rating = F.when(apdex >= APDEX_RATINGS[0][0], APDEX_RATINGS[0][1])
    for thr, name in APDEX_RATINGS[1:]:
        rating = rating.when(apdex >= thr, name)
    rating = rating.otherwise("unacceptable")
    return agg.select(
        "grp",
        "n",
        "n_satisfied",
        "n_tolerating",
        "n_frustrated",
        F.round(apdex, round_digits).alias("apdex"),
        rating.alias("rating"),
    )


def rfm_segments(
    events: DataFrame,
    n_tiles: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation.

    The direct-marketing workhorse (Hughes, "Strategic Database
    Marketing", 1994) that survives as the default user-value
    segmentation in product analytics: score each user 1..n_tiles on
    Recency (days since last event — lower is better), Frequency
    (event count) and Monetary (value sum), via rank tiles.  Tiles
    use ``ntile`` over a TOTALLY ordered key (metric, then user id)
    so the bucketing is deterministic and engine-independent — plain
    ntile over ties is implementation-defined, the classic
    reproducibility bug in RFM pipelines.  Champions are 555-ish,
    at-risk high-value are r=1/m=5, etc.; this emits the per-user
    scores and the segment-size rollup consumes them downstream.

    One row per user: (user_id, recency_days, frequency, monetary,
    r_score, f_score, m_score, rfm).  r_score is reversed (most
    recent = n_tiles).
    """
    from pyspark.sql import Window

    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
    )
    per = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(value_col).alias("monetary_raw"),
    )
    horizon = events.agg(F.max(day).alias("end_day"))
    scored = per.crossJoin(F.broadcast(horizon)).withColumn(
        "recency_days", F.col("end_day") - F.col("last_day")
    )
    wr = Window.orderBy(
        F.col("recency_days").desc(), F.col("user_id").asc()
    )
    wf = Window.orderBy(F.col("frequency").asc(), F.col("user_id").asc())
    wm = Window.orderBy(
        F.col("monetary_raw").asc(), F.col("user_id").asc()
    )
    out = (
        scored.withColumn("r_score", F.ntile(n_tiles).over(wr))
        .withColumn("f_score", F.ntile(n_tiles).over(wf))
        .withColumn("m_score", F.ntile(n_tiles).over(wm))
    )
    return out.select(
        "user_id",
        "recency_days",
        "frequency",
        F.round("monetary_raw", round_digits).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm"),
    )


def ltv_curve(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Cohort cumulative-value (LTV) curve by weekly cohort and age.

    The standard cohorted lifetime-value triangle (the revenue twin
    of ``retention_cohorts``): users cohorted by first-activity ISO
    Monday week; for each cohort and week age a, the CUMULATIVE value
    per cohort user through that age.  Comparing rows at equal age
    across cohorts is the honest LTV trend read — calendar totals mix
    cohort sizes and ages and systematically flatter growth.

    One row per (cohort_week, week_age): (cohort_week, week_age,
    cohort_users, week_value, cum_value, cum_value_per_user).
    Shape: user rollup for cohorts, (cohort, age) rollup, one
    cumulative window per cohort over the tiny triangle.
    """
    from pyspark.sql import Window

    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    first_w = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(week).alias("cohort_week")
    )
    sizes = first_w.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    j = events.select(
        F.col(user_col).alias("u"),
        week.alias("w"),
        F.col(value_col).alias("v"),
    ).join(first_w, "u")
    per = j.groupBy("cohort_week",
                    F.datediff(F.col("w"), F.col("cohort_week"))
                    .alias("age_days")).agg(F.sum("v").alias("week_value"))
    per = per.select(
        "cohort_week",
        (F.col("age_days") / 7).cast("long").alias("week_age"),
        "week_value",
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = per.withColumn("cum_value", F.sum("week_value").over(wcum))
    return out.join(sizes, "cohort_week").select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        "week_age",
        "cohort_users",
        F.round("week_value", round_digits).alias("week_value"),
        F.round("cum_value", round_digits).alias("cum_value"),
        F.round(
            F.col("cum_value") / F.col("cohort_users"), round_digits
        ).alias("cum_value_per_user"),
    )


def burstiness_params(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Goh-Barabasi burstiness and memory of inter-event times.

    Goh & Barabasi, "Burstiness and memory in complex systems" (EPL
    2008): characterize an event stream by its inter-arrival
    distribution's coefficient of variation folded into

        B = (sigma - mu) / (sigma + mu)   in (-1, 1)

    (B = -1 periodic, 0 Poisson, -> 1 extremely bursty) and the
    MEMORY coefficient M = Pearson correlation of consecutive
    inter-event times.  The scalar twin of the Kleinberg burst
    detector (``ops/bursts.py``): Kleinberg finds WHEN the bursts
    are, B/M say HOW bursty the process is — the pair
    (crawl-politeness and capacity models consume both).

    Per group: (grp, n_gaps, mean_gap_s, cv, burstiness, memory).
    Sufficient-statistic sums only; one lag window for gaps, a second
    for consecutive-gap pairs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(ts_col, "event_id")
    gaps = (
        events.withColumn(
            "gap",
            (
                F.unix_timestamp(ts_col)
                - F.unix_timestamp(F.lag(ts_col).over(w))
            ).cast("double"),
        )
        .filter(F.col("gap").isNotNull())
        .withColumn("nxt_gap", F.lead("gap").over(w))
        .select(F.col(group_col).alias("grp"), "gap", "nxt_gap")
    )
    agg = gaps.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("gap").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).alias("ss"),
        F.sum(F.when(F.col("nxt_gap").isNotNull(), F.col("gap"))).alias(
            "px"
        ),
        F.sum(F.when(F.col("nxt_gap").isNotNull(), F.col("nxt_gap"))).alias(
            "py"
        ),
        F.sum(
            F.when(
                F.col("nxt_gap").isNotNull(),
                F.col("gap") * F.col("gap"),
            )
        ).alias("pxx"),
        F.sum(
            F.when(
                F.col("nxt_gap").isNotNull(),
                F.col("nxt_gap") * F.col("nxt_gap"),
            )
        ).alias("pyy"),
        F.sum(
            F.when(
                F.col("nxt_gap").isNotNull(),
                F.col("gap") * F.col("nxt_gap"),
            )
        ).alias("pxy"),
        F.sum(F.col("nxt_gap").isNotNull().cast("double")).alias("np"),
    )
    mu = F.col("s") / F.col("n")
    sigma = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
        / F.col("n")
    )
    npair = F.col("np")
    mcov = F.col("pxy") - F.col("px") * F.col("py") / npair
    mvx = F.col("pxx") - F.col("px") * F.col("px") / npair
    mvy = F.col("pyy") - F.col("py") * F.col("py") / npair
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mu, round_digits).alias("mean_gap_s"),
        F.round(sigma / mu, round_digits).alias("cv"),
        F.round((sigma - mu) / (sigma + mu), round_digits).alias(
            "burstiness"
        ),
        F.round(
            F.when(
                (mvx > 0) & (mvy > 0), mcov / F.sqrt(mvx * mvy)
            ),
            round_digits,
        ).alias("memory"),
    )


def percentiles_bucket(
    events: DataFrame,
    percentiles=(0.5, 0.9, 0.99),
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """ES ``percentiles_bucket`` pipeline agg: exact percentiles OVER
    the daily-count bucket values per group (the sibling pipeline agg
    to ``stats_bucket``): which day-volume is a p90 day?  Exact
    linear-interpolation percentiles (percentile_cont semantics —
    both engines interpolate identically on the sorted bucket list;
    the approximate t-digest ES uses at scale is deliberately NOT
    replicated, the bucket list is small by construction).

    One row per (grp, pct): (grp, pct, n_buckets, value)."""
    d = events.groupBy(
        F.col(group_col).alias("grp"),
        F.datediff(
            F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    out = None
    for p in percentiles:
        row = d.groupBy("grp").agg(
            F.lit(float(p)).alias("pct"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.percentile("y", F.lit(float(p))), round_digits)
            .alias("value"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def funnel_latency(
    events: DataFrame,
    start_type: str = "view",
    end_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Time-to-convert distribution for a two-step funnel: per
    converting user, the latency from FIRST ``start_type`` to the
    first ``end_type`` at-or-after it; exact p50/p90 + mean over
    converters — the latency companion to the step-count funnel
    (``funnel_steps``).  One row: (n_start_users, n_converted,
    conversion_rate, mean_s, p50_s, p90_s)."""
    firsts = events.filter(F.col(type_col) == start_type).groupBy(
        F.col(user_col).alias("u")
    ).agg(F.min(ts_col).alias("t0"))
    ends = events.filter(F.col(type_col) == end_type).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t1")
    )
    conv = (
        firsts.join(ends, "u")
        .filter(F.col("t1") >= F.col("t0"))
        .groupBy("u", "t0")
        .agg(F.min("t1").alias("t1"))
        .select(
            "u",
            (
                F.unix_timestamp("t1") - F.unix_timestamp("t0")
            ).cast("double").alias("lat_s"),
        )
    )
    n_start = firsts.count()
    return conv.agg(
        F.lit(n_start).alias("n_start_users"),
        F.count(F.lit(1)).alias("n_converted"),
        F.round(
            F.count(F.lit(1)) / F.lit(float(n_start)), round_digits
        ).alias("conversion_rate"),
        F.round(F.avg("lat_s"), round_digits).alias("mean_s"),
        F.round(F.percentile("lat_s", F.lit(0.5)), round_digits).alias(
            "p50_s"
        ),
        F.round(F.percentile("lat_s", F.lit(0.9)), round_digits).alias(
            "p90_s"
        ),
    )


def cube_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Multi-grain CUBE rollup in one pass — Spark's native OLAP
    operator.

    Gray et al., "Data Cube: a relational aggregation operator
    generalizing group-by, cross-tab, and sub-totals" (ICDE 1996):
    one shuffle computes every grouping-set combination of
    (event_type, weekday) — the per-cell aggregates, both marginals,
    and the grand total — with ``grouping_id`` disambiguating NULL
    group values from the rolled-up ALL.  This is ``df.cube`` +
    ``F.grouping_id`` (Catalyst expands the sets map-side; at scale
    this beats four separate group-bys by sharing the scan and the
    partial aggregation), replayed by the oracle as GROUPING SETS.

    One row per cell: (event_type, weekday_iso, gid, n_events,
    total_value) with NULL group columns on rolled-up axes.
    """
    weekday = (
        (
            F.datediff(
                F.to_date(F.col(ts_col)),
                F.lit("1970-01-01").cast("date"),
            )
            + 3
        )
        % 7
        + 1
    ).cast("int")
    base = events.select(
        F.col(type_col).alias("event_type"),
        weekday.alias("weekday_iso"),
        F.col(value_col).alias("v"),
    )
    return (
        base.cube("event_type", "weekday_iso")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("v"), round_digits).alias("total_value"),
        )
        .select(
            "event_type", "weekday_iso", "gid", "n_events",
            "total_value",
        )
    )


ATTRIBUTION_U_SHAPE = (0.4, 0.2, 0.4)  # first / middle-pool / last


def attribution_models(
    events: DataFrame,
    conversion_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Multi-touch attribution model comparison — first/last/linear/
    position-based credit per channel.

    The standard marketing-attribution battery (the heuristics
    Shao & Li, KDD 2011 benchmark their data-driven model against):
    for each conversion, credit the touchpoints (the user's non-
    conversion events at or before their FIRST conversion):

        first_touch    all credit to the earliest touch
        last_touch     all credit to the latest touch
        linear         1/n to each touch
        u_shaped       40% first, 40% last, 20% split over middle

    Per (model, channel): total credit — the divergence between the
    columns IS the business decision (a channel strong under
    last-touch but weak under first-touch closes rather than opens).
    Single-touch paths give that touch full credit under every model.

    Scale shape: one conversion-time rollup, one touch join, rank
    windows per user path, credit as projections — no path collection.
    """
    from pyspark.sql import Window

    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("conv_ts"))
    )
    touches = (
        events.filter(F.col(type_col) != conversion_type)
        .select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(type_col).alias("channel"),
        )
        .join(conv, "u")
        .filter(F.col("t") <= F.col("conv_ts"))
    )
    w = Window.partitionBy("u").orderBy("t")
    wn = Window.partitionBy("u")
    ranked = (
        touches.withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    first_w, mid_w, last_w = ATTRIBUTION_U_SHAPE
    credits = ranked.select(
        "channel",
        F.when(F.col("pos") == 1, 1.0).otherwise(0.0).alias("first_touch"),
        F.when(F.col("pos") == F.col("n"), 1.0)
        .otherwise(0.0)
        .alias("last_touch"),
        (1.0 / F.col("n")).alias("linear"),
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2,
              F.when(F.col("pos") == 1, 0.5).otherwise(0.5))
        .when(F.col("pos") == 1, F.lit(first_w))
        .when(F.col("pos") == F.col("n"), F.lit(last_w))
        .otherwise(F.lit(mid_w) / (F.col("n") - 2))
        .alias("u_shaped"),
    )
    return credits.groupBy("channel").agg(
        F.round(F.sum("first_touch"), round_digits).alias("first_touch"),
        F.round(F.sum("last_touch"), round_digits).alias("last_touch"),
        F.round(F.sum("linear"), round_digits).alias("linear"),
        F.round(F.sum("u_shaped"), round_digits).alias("u_shaped"),
    )


def hill_tail_estimator(
    events: DataFrame,
    k_frac: float = 0.1,
    value_col: str = "value",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Hill estimator of the power-law tail index per group.

    Hill, "A simple general approach to inference about the tail of a
    distribution" (Annals of Statistics 1975): with order statistics
    x_(1) >= ... >= x_(n) and k upper extremes,

        1 / alpha_hat = (1/k) * sum_{i=1..k} ln( x_(i) / x_(k+1) )

    — the MLE of the Pareto tail exponent, the principled companion
    to the rank-frequency OLS ``zipf_fit`` (which fits the WHOLE
    distribution and is biased by the body; Hill reads only the
    tail, which is what capacity/skew planning actually depends on:
    alpha <= 2 means infinite variance, no CLT for your load
    averages).  k = ceil(k_frac * n) pinned, ties broken by order.

    Per group: (grp, n, k, x_k1, alpha_hat, infinite_variance).
    One rank window + one aggregate.
    """
    from pyspark.sql import Window

    v = events.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("x"),
    ).filter(F.col("x") > 0)
    w = Window.partitionBy("grp").orderBy(F.col("x").desc())
    ranked = v.withColumn("r", F.row_number().over(w))
    counts = ranked.groupBy("grp").agg(F.max("r").alias("n"))
    kk = counts.select(
        "grp",
        "n",
        F.ceil(F.col("n") * k_frac).cast("long").alias("k"),
    )
    xk1 = (
        ranked.join(kk, "grp")
        .filter(F.col("r") == F.col("k") + 1)
        .select("grp", F.col("x").alias("x_k1"))
    )
    top = (
        ranked.join(kk, "grp")
        .filter(F.col("r") <= F.col("k"))
        .join(xk1, "grp")
        .groupBy("grp", "n", "k", "x_k1")
        .agg(
            F.avg(F.log(F.col("x") / F.col("x_k1"))).alias("inv_alpha")
        )
    )
    alpha = F.when(
        F.col("inv_alpha") > 0, 1.0 / F.col("inv_alpha")
    )
    return top.select(
        "grp",
        "n",
        "k",
        F.round("x_k1", round_digits).alias("x_k1"),
        F.round(alpha, round_digits).alias("alpha_hat"),
        (alpha <= 2.0).alias("infinite_variance"),
    )


RETENTION_DAYS = (7, 30, 90)


def data_retention_audit(
    events: DataFrame,
    as_of: str,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Retention-policy simulation — what each TTL would delete, per
    type.

    The GDPR-era storage-governance table (and the cost model behind
    every log TTL decision): for each candidate retention window,
    the rows that an ``event_time < as_of - N days`` purge would
    remove and the fraction of the table that survives.  Running it
    per type exposes the policy split the flat TTL hides: error logs
    often need 90 days while click logs can drop at 7.

    Per (grp, retention_days): (grp, retention_days, n_total,
    n_deleted, n_kept, kept_frac).  Pure date-threshold projections +
    hash aggregates.
    """
    anchor = F.lit(as_of).cast("timestamp")
    out = None
    for days in RETENTION_DAYS:
        cutoff = anchor - F.expr(f"interval {days} days")
        per = events.groupBy(F.col(group_col).alias("grp")).agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                (F.col(ts_col) < cutoff).cast("long")
            ).alias("n_deleted"),
        )
        row = per.select(
            "grp",
            F.lit(days).alias("retention_days"),
            "n_total",
            "n_deleted",
            (F.col("n_total") - F.col("n_deleted")).alias("n_kept"),
            F.round(
                (F.col("n_total") - F.col("n_deleted"))
                / F.col("n_total").cast("double"),
                round_digits,
            ).alias("kept_frac"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def hourly_latency_grid(
    events: DataFrame,
    latency_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Hour-of-day latency heatmap row — exact p50/p95 per hour with
    the peak flagged.

    The capacity-planning view every SLO dashboard opens with (the
    diurnal load cycle ``weekday_profile`` shows for volume, here for
    latency): per hour-of-day bucket, exact interpolated median and
    p95 of the latency metric plus volume; the peak-p95 hour is where
    capacity headroom is spent (and feeds the Erlang sizing in
    ``index/capacity.py``).

    Per hour: (hour, n, p50, p95, is_peak_p95).
    """
    from pyspark.sql import Window

    per = events.groupBy(F.hour("ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.percentile(latency_col, F.lit(0.5)), round_digits
        ).alias("p50"),
        F.round(
            F.percentile(latency_col, F.lit(0.95)), round_digits
        ).alias("p95"),
    )
    wall = Window.orderBy(F.lit(1))
    return per.withColumn(
        "is_peak_p95", F.col("p95") == F.max("p95").over(wall)
    )


HOLIDAYS = ("2024-01-01", "2024-01-15")


def holiday_lift(
    events: DataFrame,
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Holiday-vs-baseline volume lift per type over a pinned holiday
    calendar — the calendar-effect covariate every forecast model
    (``ops/movingfn.py``, ``ops/trend.py``) needs as an exogenous
    regressor before calling a spike an anomaly.

    Per type: (grp, n_holidays, n_regular_days, mean_holiday,
    mean_regular, lift)."""
    is_hol = F.to_date("ts").cast("string").isin(*HOLIDAYS)
    daily = events.groupBy(
        F.col(group_col).alias("grp"),
        F.to_date("ts").alias("day"),
        is_hol.alias("hol"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    agg = daily.groupBy("grp").agg(
        F.sum(F.col("hol").cast("long")).alias("n_holidays"),
        F.sum((~F.col("hol")).cast("long")).alias("n_regular_days"),
        F.avg(F.when(F.col("hol"), F.col("y"))).alias("mh"),
        F.avg(F.when(~F.col("hol"), F.col("y"))).alias("mr"),
    )
    return agg.select(
        "grp",
        "n_holidays",
        "n_regular_days",
        F.round("mh", round_digits).alias("mean_holiday"),
        F.round("mr", round_digits).alias("mean_regular"),
        F.round(F.col("mh") / F.col("mr"), round_digits).alias("lift"),
    )


def latest_transform(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
) -> DataFrame:
    """ES ``latest`` transform — materialize the most recent document
    per key.

    The continuous-transform primitive ES ships next to ``pivot``
    (and the streaming world calls a changelog's latest-by-key
    compaction): one row per entity carrying its newest event's
    fields, ties broken by ``order_cols`` so the materialization is
    deterministic — the exact rule a resumable transform needs (a
    nondeterministic tie yields different checkpoints on replay).

    Returns the full latest row per key plus ``n_events`` (the
    transform's doc_count).  One rank window per key — the same
    shuffle the SCD/session ops ride.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in order_cols
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    wc = Window.partitionBy(key_col)
    return (
        events.withColumn("__r", F.row_number().over(w))
        .withColumn("n_events", F.count(F.lit(1)).over(wc))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )


def dau_wau_mau(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    round_digits: int = 6,
) -> DataFrame:
    """DAU / trailing-7-day WAU / trailing-30-day MAU + stickiness.

    The product-analytics staple (the DAU/MAU "stickiness" ratio the
    growth literature tracks): per calendar day, the exact distinct
    actives that day, over the trailing 7 days, and over the trailing
    30 days, plus stickiness = DAU/MAU.  Exactness matters here —
    windowed COUNT DISTINCT does not decompose into window functions,
    so the shape is the (day, user) distinct rollup RANGE-JOINED onto
    the day grid (window sizes are constants, so the join fan-out per
    day is bounded by the window length; at 10^12 events the rollup,
    not this join, is the cost — and HLL sketches swap in at the same
    seam, ``cardinality``).

    Per day: (day, dau, wau, mau, stickiness).
    """
    du = events.select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(user_col).alias("u"),
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.countDistinct("u").alias("dau"))

    def trailing(n, name):
        j = days.alias("d").join(
            du.alias("x"),
            (F.col("x.day") <= F.col("d.day"))
            & (
                F.col("x.day")
                > F.date_sub(F.col("d.day"), n)
            ),
        )
        return j.groupBy(F.col("d.day").alias("day")).agg(
            F.countDistinct("x.u").alias(name)
        )

    out = (
        dau.join(trailing(7, "wau"), "day")
        .join(trailing(30, "mau"), "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            "mau",
            F.round(
                F.col("dau") / F.col("mau").cast("double"),
                round_digits,
            ).alias("stickiness"),
        )
    )
    return out


def growth_accounting(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    round_digits: int = 6,
) -> DataFrame:
    """Daily growth accounting — new / retained / resurrected /
    churned actives.

    The DAU decomposition the growth literature standardized (the
    Social Capital "growth accounting" memos; every product review
    reads this table): each day's actives split into NEW (first day
    ever), RETAINED (also active yesterday) and RESURRECTED (active
    before, but not yesterday); CHURNED counts yesterday's actives
    missing today.  The identity DAU_t = new + retained + resurrected
    and DAU_t - DAU_{t-1} = new + resurrected - churned is the
    consistency check dashboards silently violate — here it holds by
    construction.

    Per day: (day, dau, new_users, retained, resurrected, churned,
    quick_ratio) with quick_ratio = (new + resurrected) / churned
    (NULL when churn is zero).
    """
    du = events.select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(user_col).alias("u"),
    ).distinct()
    first = du.groupBy("u").agg(F.min("day").alias("first_day"))
    tagged = du.join(first, "u")
    prev = du.select(
        F.date_add(F.col("day"), 1).alias("day"),
        F.col("u"),
        F.lit(True).alias("was_yesterday"),
    )
    today = (
        tagged.join(prev, ["day", "u"], "left")
        .na.fill({"was_yesterday": False})
        .withColumn("is_new", F.col("day") == F.col("first_day"))
    )
    per_day = today.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau"),
        F.sum(F.col("is_new").cast("long")).alias("new_users"),
        F.sum(
            (
                ~F.col("is_new") & F.col("was_yesterday")
            ).cast("long")
        ).alias("retained"),
        F.sum(
            (
                ~F.col("is_new") & ~F.col("was_yesterday")
            ).cast("long")
        ).alias("resurrected"),
    )
    churn = (
        du.select(
            F.date_add(F.col("day"), 1).alias("day"), "u"
        )
        .join(du, ["day", "u"], "left_anti")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        per_day.join(churn, "day", "left")
        .na.fill({"churned": 0})
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "new_users",
            "retained",
            "resurrected",
            "churned",
            F.round(
                F.when(
                    F.col("churned") > 0,
                    (F.col("new_users") + F.col("resurrected"))
                    / F.col("churned").cast("double"),
                ),
                round_digits,
            ).alias("quick_ratio"),
        )
    )


def engagement_lx(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Lx engagement curve — the days-active-per-week histogram.

    The growth-analytics staple behind "L5+/L7 users" goal-setting
    (popularized by Duolingo's and Facebook's growth teams): for each
    Monday-start week, bucket active users by how many distinct days
    they showed up (1..7).  The SHAPE of the histogram — bimodal
    (tourists + devotees) vs unimodal — tells a different retention
    story than DAU/MAU alone, which is why it complements the
    stickiness ratio rather than duplicating it.

    Per week: (week, n_users, l1..l7, sum_days) — integer counts
    only (mean days-active is sum_days / n_users), so the audit
    hashes identically on every engine.
    """
    d = events.select(
        F.date_trunc("week", F.col(ts_col))
        .cast("date")
        .cast("string")
        .alias("week"),
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(user_col).alias("u"),
    ).distinct()
    per_user = d.groupBy("week", "u").agg(
        F.countDistinct("day").alias("k")
    )
    return per_user.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_users"),
        *[
            F.sum((F.col("k") == i).cast("long")).alias(f"l{i}")
            for i in range(1, 8)
        ],
        F.sum("k").cast("long").alias("sum_days"),
    )


def session_gap_sweep(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    thresholds_min: tuple = (10, 30, 60),
) -> DataFrame:
    """Inactivity-threshold sensitivity sweep for sessionization.

    The 30-minute session timeout is folklore, not physics; the
    defensible way to pick one is to sweep thresholds and look for
    the plateau where the session count stops moving (the classic
    inter-activity-gap elbow analysis).  One shuffle computes every
    per-user gap; each candidate threshold is then a conditional
    count over the same gaps — the sweep costs one pass no matter
    how many thresholds, which is what makes it viable at log scale.

    Per threshold: (gap_min, n_users, n_gaps, n_breaks, n_sessions)
    — integer counts only (sessions per user and break fraction are
    n_sessions / n_users and n_breaks / n_gaps), so the sweep hashes
    identically on every engine.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    # microsecond-exact epoch so sub-second event times compare
    # identically across engines
    ts = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = events.select(
        F.col(entity_col).alias("u"),
        (ts - F.lag(ts).over(w)).alias("gap_us"),
    )
    aggs = [
        F.countDistinct("u").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("gap_us").isNotNull().cast("long")).alias("n_gaps"),
    ]
    for t in thresholds_min:
        aggs.append(
            F.coalesce(
                F.sum(
                    (F.col("gap_us") > t * 60 * 1_000_000).cast("long")
                ),
                F.lit(0),
            ).alias(f"br{t}")
        )
    st = gaps.agg(*aggs)
    parts = []
    for t in thresholds_min:
        parts.append(
            st.select(
                F.lit(t).alias("gap_min"),
                F.col("n_users"),
                F.col("n_gaps"),
                F.col(f"br{t}").alias("n_breaks"),
                (F.col("n_users") + F.col(f"br{t}")).alias(
                    "n_sessions"
                ),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def activation_latency(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    round_digits: int = 6,
) -> DataFrame:
    """Activation latency per signup cohort — how fast do new users
    come back.

    The growth metric between acquisition and retention: for each
    first-seen-day cohort, the gap (in days) from a user's first
    active day to their SECOND distinct active day.  A cohort whose
    median gap stretches is losing its activation moment even while
    signups look healthy; the never-returned share is the
    one-and-done rate.  Two aggregations over distinct (user, day)
    pairs — no per-event state.

    Per cohort: (cohort, n_users, n_returned, frac_one_and_done,
    median_gap_days, p90_gap_days).
    """
    ud = events.select(
        F.col(user_col).alias("u"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).distinct()
    first = ud.groupBy("u").agg(F.min("day").alias("d1"))
    second = (
        ud.join(first, "u")
        .filter(F.col("day") > F.col("d1"))
        .groupBy("u")
        .agg(F.min("day").alias("d2"))
    )
    j = first.join(second, "u", "left").select(
        F.col("d1").cast("string").alias("cohort"),
        F.datediff(F.col("d2"), F.col("d1")).alias("gap"),
    )
    return j.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("gap").alias("n_returned"),
        F.round(
            (F.count(F.lit(1)) - F.count("gap"))
            / F.count(F.lit(1)).cast("double"),
            round_digits,
        ).alias("frac_one_and_done"),
        F.round(
            F.percentile(F.col("gap").cast("double"), F.lit(0.5)),
            round_digits,
        ).alias("median_gap_days"),
        F.round(
            F.percentile(F.col("gap").cast("double"), F.lit(0.9)),
            round_digits,
        ).alias("p90_gap_days"),
    )


def props_schema_drift(
    events: DataFrame,
    ts_col: str = "ts",
    props_col: str = "props",
) -> DataFrame:
    """Event-properties schema drift — when did the payload change
    shape.

    Semi-structured event payloads drift silently: a client release
    adds a key, an ETL rename drops one, and downstream consumers
    discover it weeks later.  The audit extracts the JSON key set
    syntactically per week and diffs consecutive weeks — added and
    removed keys per week is the schema-registry changelog
    reconstructed from the data itself.

    Per week: (week, n_keys, n_new, n_dropped, keys_csv).
    """
    wk = (
        F.date_trunc("week", F.col(ts_col))
        .cast("date")
        .cast("string")
    )
    key = F.explode(
        F.regexp_extract_all(
            F.col(props_col), F.lit(r'"(\w+)":'), 1
        )
    )
    wk_keys = (
        events.select(wk.alias("week"), key.alias("k"))
        .distinct()
    )
    per = wk_keys.groupBy("week").agg(
        F.sort_array(F.collect_set("k")).alias("ks")
    )
    w = Window.orderBy("week")
    prev = F.lag("ks").over(w)
    return per.select(
        "week",
        F.size("ks").alias("n_keys"),
        F.when(
            prev.isNull(), F.lit(0)
        ).otherwise(
            F.size(F.array_except(F.col("ks"), prev))
        ).alias("n_new"),
        F.when(
            prev.isNull(), F.lit(0)
        ).otherwise(
            F.size(F.array_except(prev, F.col("ks")))
        ).alias("n_dropped"),
        F.array_join("ks", ",").alias("keys_csv"),
    )
