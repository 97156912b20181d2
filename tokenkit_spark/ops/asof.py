"""As-of join (latest-preceding-event attribution) — the time-series
join Spark lacks natively, expressed as the single-shuffle union-window
plan.

The as-of join attaches to every left row the most recent right row
with the same key and an earlier-or-equal timestamp (the kdb `aj` /
pandas `merge_asof` / DuckDB `ASOF JOIN` contract, inclusive on ties).
The classic web-analytics instance: attribute every purchase to the
latest preceding view by the same user.

Spark-first shape — the plan that survives 100 TB: a naive formulation
is a range theta-join (quadratic per key, and Catalyst gives it a
broadcast-nested-loop); ``merge_asof``-style per-key sorting in pandas
doesn't distribute. Instead: UNION the two sides with a side tag,
shuffle ONCE on the key, and inside each key partition take the
running ``last(right_value, ignorenulls)`` over (ts, side) order —
right rows sort before left rows at equal ts, which is exactly the
inclusive-tie rule. One shuffle, no join fan-out, no per-key
quadratics; skewed keys behave like any window (AQE-splittable since
the window is rows-based and streaming-evaluated).

Determinism: multiple right rows at the same (key, ts) are collapsed
first (max of the value column), so "latest match" is single-valued on
both engines — DuckDB's ASOF leaves equal-timestamp choice
unspecified otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.ops.events import _epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    prefix: str = "asof",
) -> DataFrame:
    """Left rows with three extra columns: ``<prefix>_ts`` (timestamp
    of the latest right row at or before the left row's ts, same key),
    ``<prefix>_value`` (that row's ``value_col``, deduplicated by max
    at equal (key, ts)), and ``<prefix>_lag_us`` (microseconds between
    them). Unmatched left rows keep nulls."""
    r = (
        right.groupBy(key_col, ts_col)
        .agg(F.max(value_col).alias("__rv"))
        .select(
            F.col(key_col).alias("__k"),
            F.col(ts_col).alias("__ts"),
            F.lit(0).alias("__side"),
            F.col("__rv"),
        )
    )
    left_cols = left.columns
    l = left.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c) for c in left_cols],
    )
    u = r.select(
        "__k", "__ts", "__side", "__rv",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
    ).unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)
    matched_val = F.last(
        F.when(F.col("__side") == 0, F.col("__rv")), ignorenulls=True
    ).over(w)
    flagged = (
        u.withColumn("__mts", matched_ts)
        .withColumn("__mv", matched_val)
        .filter(F.col("__side") == 1)
    )
    flagged = flagged.withColumn(
        "__lag", _epoch_us(flagged, "__ts") - _epoch_us(flagged, "__mts")
    )
    return (
        flagged.select(
            *left_cols,
            F.col("__mts").alias(f"{prefix}_ts"),
            F.col("__mv").alias(f"{prefix}_value"),
            F.col("__lag").alias(f"{prefix}_lag_us"),
        )
    )


def purchase_view_attribution(
    events: DataFrame, round_digits: int = 6
) -> DataFrame:
    """Every purchase attributed to the user's latest preceding view
    (inclusive as-of): (event_id, user_id, ts_us, view_ts_us,
    view_value, lag_us) ordered by event_id — the registry/oracle
    surface with timestamps projected to exact epoch microseconds."""
    purchases = events.filter(F.col("event_type") == "purchase")
    views = events.filter(F.col("event_type") == "view")
    j = asof_join(
        purchases.select("event_id", "user_id", "ts", "value"),
        views.select("user_id", "ts", "value"),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        prefix="view",
    )
    return j.select(
        "event_id",
        "user_id",
        _epoch_us(j, "ts").alias("ts_us"),
        _epoch_us(j, "view_ts").alias("view_ts_us"),
        F.round("view_value", round_digits).alias("view_value"),
        F.col("view_lag_us").alias("lag_us"),
    ).orderBy("event_id")
