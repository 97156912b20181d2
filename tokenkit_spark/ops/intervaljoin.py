"""Interval (range) join — events against irregular time windows,
expressed as the bucketized equi-join that survives web scale.

The naive plan for ``event.ts BETWEEN w.start AND w.end`` is a theta
join: Catalyst can only give it broadcast-nested-loop (fine for a
handful of windows, quadratic death for many). The standard scalable
rewrite (the same trick Databricks' range-join optimization and
interval trees encode): pick a bucket width, EXPLODE each interval to
the buckets it overlaps, bucket each event by its timestamp, hash
equi-join on the bucket id, then re-check the exact predicate. An
event lives in exactly one bucket, so no post-join dedup is needed;
the join is a plain shuffled hash join on a dense integer key, and
bucket width trades explode fan-out against join selectivity (pick
~median interval length so each interval explodes to O(1) buckets).

``event_incident_rollup`` pins a deterministic set of overlapping
"incident" windows (pure arithmetic over an epoch base) so the DuckDB
oracle can restate the same intervals and check the rollup exactly
with the naive theta join — small-scale truth for the bucketized plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenkit_spark.ops.events import _epoch_us

_HOUR_US = 3_600_000_000


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 6 * _HOUR_US,
) -> DataFrame:
    """Inner join of events to every interval with
    start <= ts < end (half-open), via bucket-explode + equi-join +
    exact refine. Returns events columns + intervals columns."""
    b_ev = events.withColumn(
        "__b", F.floor(F.col(ts_col) / bucket_us).cast("long")
    )
    b_iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_us).cast("long"),
                # end is exclusive: a window ending exactly on a bucket
                # boundary does not reach into that bucket
                F.floor((F.col(end_col) - 1) / bucket_us).cast("long"),
            )
        ),
    )
    return (
        b_ev.join(b_iv, "__b")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__b")
    )


def incident_windows(spark, n: int = 20) -> DataFrame:
    """``n`` deterministic, mutually-overlapping incident windows over
    January 2024 (the events table's span): incident i starts at
    base + i*33h and lasts (i mod 5 + 1) * 7 hours. Pure arithmetic —
    the oracle restates it as a VALUES-free SQL expression."""
    base = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    return spark.range(n).select(
        F.col("id").alias("incident_id"),
        (F.lit(base) + F.col("id") * (33 * _HOUR_US)).alias("start_us"),
        (
            F.lit(base)
            + F.col("id") * (33 * _HOUR_US)
            + ((F.col("id") % 5) + 1) * (7 * _HOUR_US)
        ).alias("end_us"),
    )


def event_incident_rollup(
    events: DataFrame, incidents: DataFrame, round_digits: int = 4
) -> DataFrame:
    """Per-incident rollup of the events caught inside its window:
    (incident_id, start_us, end_us, n_events, n_users, sum_value),
    zero-filled for incidents that caught nothing, ordered by
    incident_id."""
    ev = events.select(
        _epoch_us(events, "ts").alias("ts_us"), "user_id", "value"
    )
    j = interval_join(ev, incidents)
    agg = j.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), round_digits).alias("sum_value"),
    )
    return (
        incidents.join(agg, "incident_id", "left")
        .select(
            "incident_id",
            "start_us",
            "end_us",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("incident_id")
    )
