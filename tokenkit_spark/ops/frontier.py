"""URL-frontier scheduling: politeness-aware crawl ordering.

The constraint that shapes every crawler: a host may only be fetched
once per politeness interval, so the frontier must interleave hosts —
a million queued URLs on one host cannot monopolize the fetch fleet.

Relational formulation (no queues, no driver state): within each host,
rank URLs by priority (wave = per-host fetch slot, 0-based); the fetch
order is then (wave, priority desc) — wave w contains at most one URL
per host, so executing waves in order respects per-host politeness
while keeping every fetcher busy. This is exactly the Mercator
front/back-queue discipline expressed as two window functions, and it
scales: one shuffle on host for the wave numbering, one global sort
that Spark executes as a range-partitioned sort at any frontier size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_frontier(
    urls: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """(host, url, priority, ...) -> + (wave, fetch_order): wave is the
    per-host politeness slot (0 = that host's best URL); fetch_order is
    the global dispatch sequence — all of wave 0 (best-first across
    hosts), then wave 1, ... Ties break on url for determinism.

    The global sequence is built WITHOUT a global window (which would
    single-partition a 10^10-row frontier): rank within wave (a
    distributed window keyed on wave), plus each wave's start offset
    from a cumulative sum over the per-wave counts — a table with one
    row per wave (bounded by the deepest host queue), broadcast back.
    A wave holds at most one row per host; if a single wave outgrows a
    task at extreme host counts, the next knob is sub-bucketing each
    wave by priority band before ranking.
    """
    per_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    ranked = urls.withColumn("wave", F.row_number().over(per_host) - 1)
    in_wave = Window.partitionBy("wave").orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    offsets = (
        ranked.groupBy("wave").count()
        .withColumn(
            "wave_offset",
            F.coalesce(
                F.sum("count").over(
                    Window.orderBy("wave").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("count")
    )
    return (
        ranked.withColumn("__rw", F.row_number().over(in_wave) - 1)
        .join(F.broadcast(offsets), "wave")
        .withColumn("fetch_order", F.col("wave_offset") + F.col("__rw"))
        .drop("__rw", "wave_offset")
    )


def frontier_budget(
    urls: DataFrame,
    per_host_cap: int,
    host_col: str = "host",
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """Crawl-budget enforcement: keep each host's top ``per_host_cap``
    URLs by priority and drop the rest — the standard defense against
    crawler traps (calendars, faceted search) that generate unbounded
    URL spaces under one host."""
    per_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    return (
        urls.withColumn("__r", F.row_number().over(per_host))
        .filter(F.col("__r") <= per_host_cap)
        .drop("__r")
    )


def schedule_with_delays(
    urls: DataFrame,
    delays: DataFrame,
    default_delay_s: float = 1.0,
    host_col: str = "host",
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """Politeness schedule with per-host Crawl-delay: wave numbering as
    in :func:`schedule_frontier`, plus ``fetch_at_s`` = wave × the
    host's delay (robots Crawl-delay when published, ``default_delay_s``
    otherwise) — the earliest second each URL may be fetched relative to
    the host's first hit. ``delays`` is (host, delay_s), one row per
    host (broadcast-joined)."""
    per_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    d = delays.select(F.col(host_col).alias("__dh"), "delay_s")
    return (
        urls.withColumn("wave", F.row_number().over(per_host) - 1)
        .join(F.broadcast(d), F.col(host_col) == F.col("__dh"), "left")
        .withColumn(
            "fetch_at_s",
            F.col("wave") * F.coalesce(F.col("delay_s"), F.lit(float(default_delay_s))),
        )
        .drop("__dh", "delay_s")
    )
