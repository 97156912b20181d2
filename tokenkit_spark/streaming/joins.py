"""Watermarked stream-stream interval join — click attribution over
unbounded impression/click streams.

The Structured Streaming stream-stream join (Spark SQL guide,
"Stream-stream Joins"; Armbrust et al., "Structured Streaming: A
Declarative API for Real-Time Applications in Apache Spark", SIGMOD
2018 §4.3): joining two unbounded streams requires BOTH sides to
buffer state, and the only way to bound that state is a watermark on
each side plus a time-range join condition — then the engine can
evict an impression once no future click can land inside its
attribution window, and a click once its candidate impressions have
all been seen.

The operator here is the canonical ads/search-log use: attribute each
click to the impression of the same (user, item) that happened at
most ``window_minutes`` BEFORE it (inner join; unmatched impressions
are abandoned views).  State per key is bounded by
watermark_delay + window_minutes of arrivals — the exact bound the
SIGMOD paper derives — so the join runs forever on a 100-TB/day
stream without state growth, unlike an unconstrained stream join
(which Structured Streaming rejects outright in append mode).

Batch twin for tests/oracles: the same join condition on static
DataFrames (``attribute_clicks_batch``) — streaming output must equal
it for on-time data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    window_minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming inner interval join: one row per (impression, click)
    attribution pair — (user_id, item_id, imp_ts, click_ts,
    lag_seconds)."""
    i = (
        impressions.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("i_user"),
            F.col("item_id").alias("i_item"),
            F.col("ts").alias("imp_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("item_id").alias("c_item"),
            F.col("ts").alias("click_ts"),
        )
    )
    cond = (
        (F.col("i_user") == F.col("c_user"))
        & (F.col("i_item") == F.col("c_item"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (
            F.col("click_ts")
            <= F.col("imp_ts") + F.expr(f"interval {int(window_minutes)} minutes")
        )
    )
    return i.join(c, cond, "inner").select(
        F.col("i_user").alias("user_id"),
        F.col("i_item").alias("item_id"),
        "imp_ts",
        "click_ts",
        (
            F.unix_timestamp("click_ts") - F.unix_timestamp("imp_ts")
        ).alias("lag_seconds"),
    )


def attribute_clicks_batch(
    impressions: DataFrame, clicks: DataFrame, window_minutes: int = 5
) -> DataFrame:
    """Static twin of ``attribute_clicks`` (no watermarks) — the
    correctness oracle for the streaming path."""
    i = impressions.select(
        F.col("user_id").alias("i_user"),
        F.col("item_id").alias("i_item"),
        F.col("ts").alias("imp_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("item_id").alias("c_item"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (F.col("i_user") == F.col("c_user"))
        & (F.col("i_item") == F.col("c_item"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (
            F.col("click_ts")
            <= F.col("imp_ts") + F.expr(f"interval {int(window_minutes)} minutes")
        )
    )
    return i.join(c, cond, "inner").select(
        F.col("i_user").alias("user_id"),
        F.col("i_item").alias("item_id"),
        "imp_ts",
        "click_ts",
        (
            F.unix_timestamp("click_ts") - F.unix_timestamp("imp_ts")
        ).alias("lag_seconds"),
    )
