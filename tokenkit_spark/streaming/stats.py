"""Streaming crawl analytics + stateful cross-batch dedup.

Two Structured-Streaming operators the continuous-crawl side of a
training-data pipeline needs beyond index generations (ingest.py):

* ``crawl_stats`` — event-time windowed page counts / text-length stats
  per language with a WATERMARK on ``warc_ts``: late pages behind the
  watermark are dropped, closed windows emit exactly once (append
  mode), and state is bounded by the watermark horizon — the standard
  Spark late-data design, no custom state.

* ``first_seen_pages`` — cross-batch exact dedup via
  ``applyInPandasWithState``: per-host state holds the set of content
  hashes already emitted; a page whose (host, content-hash) was seen in
  ANY earlier micro-batch is suppressed. This is the streaming twin of
  ``ops.dedup.exact_dups`` — the batch op dedups a static corpus, this
  one dedups an unbounded arrival stream with O(distinct-hashes) state
  per host, partitioned by the group key so state never concentrates.

Both take the raw pages stream (``sources.pages.PAGES_SCHEMA``:
url, warc_ts, html, text, lang) and return transformed streaming
DataFrames — callers attach their own sink, tests use a memory sink.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, pages_path: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """File-source stream over a directory crawl drops land in."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_path)
    )


def crawl_stats(
    pages: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-language crawl stats with late-data handling:
    (win_start, win_end, lang, n_pages, avg_text_len). Pages later than
    ``watermark`` behind the max seen ``warc_ts`` are dropped; in append
    output mode a window emits once, when the watermark passes its end."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration).alias("win"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.round(F.avg(F.length("text")), 2).alias("avg_text_len"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "lang",
            "n_pages",
            "avg_text_len",
        )
    )


_FIRST_SEEN_OUT = "host string, url string, warc_ts timestamp, content_hash long"
_FIRST_SEEN_STATE = "hashes array<long>"


def _first_seen_kernel(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    host = key[0]
    out = []
    # materialize ALL Arrow chunks before sorting: a per-chunk sort
    # would make "earliest crawl wins" depend on chunk boundaries
    chunks = list(pdfs)
    if not chunks:
        yield pd.DataFrame(
            [], columns=["host", "url", "warc_ts", "content_hash"]
        )
        return
    batch = pd.concat(chunks, ignore_index=True)
    batch = batch.sort_values(["warc_ts", "url"], kind="mergesort")
    for row in batch.itertuples(index=False):
        h = int(row.content_hash)
        if h in seen:
            continue
        seen.add(h)
        out.append((host, row.url, row.warc_ts, h))
    state.update((sorted(seen),))
    yield pd.DataFrame(
        out, columns=["host", "url", "warc_ts", "content_hash"]
    )


def first_seen_pages(pages: DataFrame) -> DataFrame:
    """Emit each (host, content-hash) the FIRST time it is ever seen
    across the whole stream; later re-crawls / mirrored copies on the
    same host are suppressed. State: per-host sorted hash array."""
    keyed = pages.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        "url",
        "warc_ts",
        F.xxhash64("text").alias("content_hash"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _first_seen_kernel,
        outputStructType=_FIRST_SEEN_OUT,
        stateStructType=_FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_OUT = (
    "user_id long, start_us long, end_us long, n_events long, sum_value double"
)
_SESSION_STATE = "start_us long, end_us long, n long, sv double"


def _session_kernel(gap_us: int):
    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = ["user_id", "start_us", "end_us", "n_events", "sum_value"]
        uid = key[0]
        if state.hasTimedOut:
            s, e, n, sv = state.get
            state.remove()
            yield pd.DataFrame([(uid, s, e, n, sv)], columns=cols)
            return
        chunks = list(pdfs)
        if not chunks:
            yield pd.DataFrame([], columns=cols)
            return
        batch = pd.concat(chunks, ignore_index=True).sort_values(
            ["us", "event_id"], kind="mergesort"
        )
        cur = list(state.get) if state.exists else None
        closed = []
        for row in batch.itertuples(index=False):
            us, v = int(row.us), float(row.value)
            if cur is None:
                cur = [us, us, 1, v]
            elif us - cur[1] > gap_us:
                closed.append((uid, *cur))
                cur = [us, us, 1, v]
            else:
                # min/max, not assignment: a late-but-within-watermark
                # event (the disorder the watermark delay admits) must
                # widen the session, never shrink its end or raise its
                # start
                cur[0] = min(cur[0], us)
                cur[1] = max(cur[1], us)
                cur[2] += 1
                cur[3] += v
        state.update(tuple(cur))
        # close the open session when the event-time watermark passes
        # its gap horizon (setTimeoutTimestamp takes epoch MILLIS)
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        yield pd.DataFrame(closed, columns=cols)

    return fn


def session_windows(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    entity_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming gap-based sessionization — the unbounded twin of
    ops/events.sessionize: per-entity sessions grow in state and emit
    exactly once, when the event-time watermark passes last_event +
    gap (EventTimeTimeout).  Sessions that close INSIDE a micro-batch
    (a later event arrives > gap after the previous) emit immediately.

    State per entity is four scalars (start, end, count, sum) — O(live
    entities), not O(events); the watermark bounds how long an idle
    entity's state survives.  Epoch micros are computed from calendar
    fields (tz-independent, same rule as the batch path)."""
    from ..ops.events import _epoch_us

    gap_us = int(gap_minutes * 60 * 1_000_000)
    keyed = events.withWatermark(ts_col, watermark).select(
        F.col(entity_col).alias("user_id"),
        F.col(ts_col),
        _epoch_us(events, ts_col).alias("us"),
        F.col(id_col).alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    # output key type follows the entity column (a string session token
    # is as valid a key as a numeric user id)
    key_type = events.schema[entity_col].dataType.simpleString()
    out_schema = _SESSION_OUT.replace("user_id long", f"user_id {key_type}")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_kernel(gap_us),
        outputStructType=out_schema,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
