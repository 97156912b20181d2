"""Streaming ingestion: new page files -> index generations; the final
generation must equal a fresh batch build over all pages."""

from pyspark.sql import functions as F

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.query import bm25_segments
from tokenkit_spark.sources.pages import synth_pages
from tokenkit_spark.streaming import (
    load_latest_index,
    stream_index_updates,
)
from tokenkit_spark.streaming.ingest import _read_latest

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)


def test_stream_replay_overwrites_partial_generation(spark, tmp_path_factory):
    """Crash-safety: a generation directory left behind by a batch that
    died BEFORE publishing LATEST is rebuilt from scratch when the
    stream replays the batch — queries never see partial state."""
    import os

    root = tmp_path_factory.mktemp("replay")
    pages_dir = str(root / "pages")
    index_root = str(root / "index")
    pages = synth_pages(spark, n_docs=120, seed=7).cache()
    pages.write.mode("append").parquet(pages_dir)

    # simulate the torn state: partial gen=1 exists, LATEST was never
    # written (the crash point is between segment write and publish)
    os.makedirs(os.path.join(index_root, "gen=1", "segments"), exist_ok=True)
    with open(os.path.join(index_root, "gen=1", "segments", "junk"), "w") as f:
        f.write("partial")

    q = stream_index_updates(spark, pages_dir, index_root, CFG,
                             n_shards=2, n_buckets=2)
    q.awaitTermination(300)
    assert _read_latest(spark, index_root) >= 1
    idx = load_latest_index(spark, index_root)
    assert idx["stats"]["n_docs"] == pages.count()
    # the junk file is gone: the generation was rebuilt, not appended to
    assert not os.path.exists(os.path.join(index_root, "gen=1", "segments", "junk"))


def test_stream_ingestion_generations_equal_batch_build(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    pages_dir = str(root / "pages")
    index_root = str(root / "index")

    pages = synth_pages(spark, n_docs=400, seed=42).cache()
    even = F.pmod(F.xxhash64("url"), F.lit(2)) == 0
    batch1, batch2 = pages.filter(even), pages.filter(~even)

    # crawl drop 1 arrives -> first generation
    batch1.write.mode("append").parquet(pages_dir)
    q = stream_index_updates(spark, pages_dir, index_root, CFG,
                             n_shards=4, n_buckets=4)
    q.awaitTermination(300)
    gen1 = _read_latest(spark, index_root)
    assert gen1 >= 1
    idx1 = load_latest_index(spark, index_root)
    assert idx1["stats"]["n_docs"] == batch1.count()

    # crawl drop 2 arrives -> stream restart picks up ONLY the new files
    # (checkpointed file-source offsets) and merges a new generation
    batch2.write.mode("append").parquet(pages_dir)
    q2 = stream_index_updates(spark, pages_dir, index_root, CFG,
                              n_shards=4, n_buckets=4)
    q2.awaitTermination(300)
    assert _read_latest(spark, index_root) > gen1

    got = load_latest_index(spark, index_root)
    assert got["stats"]["n_docs"] == pages.count()

    # parity with a fresh batch build on the full corpus
    from tokenkit_spark.sources.pages import pages_to_docs

    full_path = str(root / "full")
    build_index(spark, pages_to_docs(pages).select("doc_id", "text"),
                full_path, CFG, n_shards=4, n_buckets=4)
    want = load_index(spark, full_path)

    qdf = spark.createDataFrame(
        [(0, "data search engine"), (1, "the of and"), (2, "crawl")],
        "query_id long, text string",
    )
    norm = lambda rows: sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows
    )
    a = bm25_segments(spark, got, qdf, CFG, k=10).collect()
    b = bm25_segments(spark, want, qdf, CFG, k=10).collect()
    assert norm(a) == norm(b)

    ts_a = {(r.term, r.df, r.cf) for r in got["term_stats"].collect()}
    ts_b = {(r.term, r.df, r.cf) for r in want["term_stats"].collect()}
    assert ts_a == ts_b

    # generation pruning: old gens removed, LATEST untouched and loadable
    import os

    from tokenkit_spark.streaming import prune_generations

    latest = _read_latest(spark, index_root)
    doomed = prune_generations(spark, index_root, keep=1)
    assert all(g <= latest - 1 for g in doomed)
    assert not any(
        os.path.isdir(os.path.join(index_root, f"gen={g}")) for g in doomed
    )
    still = load_latest_index(spark, index_root)
    assert still["stats"]["n_docs"] == pages.count()


def _write_batch(spark, rows, pages_dir):
    import time

    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, text string, lang string")
    df.coalesce(1).write.mode("append").parquet(pages_dir)
    time.sleep(1.1)  # distinct mod-times so maxFilesPerTrigger=1 orders batches


def test_crawl_stats_watermark_drops_late(spark, tmp_path_factory):
    """Windowed stats with a 2h watermark: once the [01:00, 02:00)
    window is finalized (watermark passed its end and the state was
    evicted), a late 01:45 arrival is dropped by the watermark and the
    emitted window never changes. (Spark applies the late filter with
    the previous batch's watermark, so the drop needs the finalize
    batch and the late batch to be distinct — hence 3 micro-batches.)"""
    import datetime as dt

    from tokenkit_spark.streaming.stats import crawl_stats, read_pages_stream

    root = tmp_path_factory.mktemp("cstats")
    pages_dir, ckpt = str(root / "pages"), str(root / "ckpt")
    d = lambda h, m=0: dt.datetime(2026, 1, 1, h, m)
    _write_batch(spark, [
        ("https://a.com/1", d(1, 0), None, "x" * 10, "en"),
        ("https://a.com/2", d(1, 30), None, "x" * 20, "en"),
        ("https://a.com/3", d(5, 0), None, "x" * 30, "en"),  # watermark -> 03:00
    ], pages_dir)
    _write_batch(spark, [
        ("https://a.com/4", d(5, 30), None, "x" * 40, "en"),  # finalizes [01:00, 02:00)
    ], pages_dir)
    _write_batch(spark, [
        ("https://a.com/5", d(1, 45), None, "x" * 99, "en"),  # LATE: dropped
        ("https://a.com/6", d(6, 0), None, "x" * 50, "en"),
    ], pages_dir)

    q = (
        crawl_stats(read_pages_stream(spark, pages_dir, max_files_per_trigger=1))
        .writeStream.format("memory").queryName("cstats_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM cstats_out").collect()
    got = {(r.win_start, r.lang): (r.n_pages, r.avg_text_len) for r in rows}
    # [01:00, 02:00) closed with ONLY the two on-time rows
    assert got == {(d(1, 0), "en"): (2, 15.0)}
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_first_seen_pages_cross_batch_dedup(spark, tmp_path_factory):
    """applyInPandasWithState: per-host content-hash state suppresses
    re-crawls in later micro-batches; same content on another host is
    independent."""
    import datetime as dt

    from tokenkit_spark.streaming.stats import first_seen_pages, read_pages_stream

    root = tmp_path_factory.mktemp("fseen")
    pages_dir, ckpt = str(root / "pages"), str(root / "ckpt")
    t = lambda i: dt.datetime(2026, 1, 1, 0, i)
    _write_batch(spark, [
        ("https://a.com/1", t(1), None, "dup content", "en"),
        ("https://a.com/2", t(2), None, "unique one", "en"),
        ("https://b.com/3", t(3), None, "dup content", "en"),
    ], pages_dir)
    _write_batch(spark, [
        ("https://a.com/4", t(4), None, "dup content", "en"),  # seen on a.com in batch 1
        ("https://a.com/5", t(5), None, "unique two", "en"),
        ("https://b.com/6", t(6), None, "dup content", "en"),  # seen on b.com in batch 1
    ], pages_dir)

    q = (
        first_seen_pages(read_pages_stream(spark, pages_dir, max_files_per_trigger=1))
        .writeStream.format("memory").queryName("fseen_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    urls = {r.url for r in spark.sql("SELECT * FROM fseen_out").collect()}
    assert urls == {
        "https://a.com/1", "https://a.com/2", "https://b.com/3", "https://a.com/5",
    }


def test_session_windows_emit_on_gap_and_watermark(spark, tmp_path_factory):
    """Streaming sessionization: a within-batch gap closes a session
    immediately; the final open session closes when a later batch's
    watermark passes its gap horizon; results equal the batch
    sessionizer on the same events."""
    import datetime as dt

    from tokenkit_spark.streaming.stats import session_windows

    root = tmp_path_factory.mktemp("sess")
    ev_dir, ckpt = str(root / "events"), str(root / "ckpt")
    t = lambda m: dt.datetime(2026, 1, 1, 10, m)
    schema = "event_id long, user_id long, ts timestamp, value double"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(ev_dir)

    # batch 1: user 1 has two sessions separated by a 60-min gap (closes
    # in-batch); user 2 one open session
    write([(0, 1, t(0), 1.0), (1, 1, t(5), 2.0), (2, 1, t(0) + dt.timedelta(hours=2), 4.0),
           (3, 2, t(10), 1.5)])
    # batch 2: far-future tick advances the watermark past every horizon
    write([(9, 99, t(0) + dt.timedelta(days=2), 0.0)])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(ev_dir)
    )
    q = (
        session_windows(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.start_us): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    base = int(dt.datetime(2026, 1, 1, 10, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    # user 1 session A: events at +0 and +5min
    assert got[(1, base)] == (2, 3.0)
    # user 1 session B: single event at +2h (closed by batch-2 watermark)
    assert got[(1, base + 2 * 3600 * 1_000_000)] == (1, 4.0)
    # user 2: single open session closed by watermark
    assert got[(2, base + 600 * 1_000_000)] == (1, 1.5)


def test_first_seen_state_ttl_eviction(spark, tmp_path_factory):
    """Bounded state (VERDICT r02 item 3): a hash last seen more than
    `retention_hours` behind the watermark is evicted, so (a) a dup
    inside the retention window stays suppressed, (b) a dup after a
    retention-sized silence re-emits — the behavioral proof that old
    state is actually dropped, not accumulated forever."""
    import datetime as dt

    from tokenkit_spark.streaming.stats import first_seen_pages, read_pages_stream

    root = tmp_path_factory.mktemp("fseenttl")
    pages_dir, ckpt = str(root / "pages"), str(root / "ckpt")
    t0 = dt.datetime(2026, 1, 1, 0, 0)
    h = lambda hours: t0 + dt.timedelta(hours=hours)
    _write_batch(spark, [("https://a.com/1", h(0), None, "old content", "en")], pages_dir)
    # +1h: dup within retention -> suppressed; watermark advances to ~+1h
    _write_batch(spark, [
        ("https://a.com/2", h(1), None, "old content", "en"),
        ("https://a.com/3", h(1), None, "fresh content", "en"),
    ], pages_dir)
    # +12h: advances the watermark far past (last_seen + 2h retention)
    _write_batch(spark, [("https://a.com/4", h(12), None, "unrelated", "en")], pages_dir)
    # the old hash was evicted, so its next sighting re-emits
    _write_batch(spark, [("https://a.com/5", h(13), None, "old content", "en")], pages_dir)

    q = (
        first_seen_pages(
            read_pages_stream(spark, pages_dir, max_files_per_trigger=1),
            watermark="1 second", retention_hours=2.0,
        )
        .writeStream.format("memory").queryName("fseen_ttl")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    urls = {r.url for r in spark.sql("SELECT * FROM fseen_ttl").collect()}
    assert "https://a.com/2" not in urls          # dup inside retention
    assert "https://a.com/5" in urls              # re-emits after eviction
    assert {"https://a.com/1", "https://a.com/3", "https://a.com/4"} <= urls


def test_session_windows_late_distinct_earlier_session(spark, tmp_path_factory):
    """When the watermark delay exceeds the gap, a late event landing
    more than gap BEFORE the open session's start must become its own
    closed session — not silently merge into (and widen) the open one."""
    import datetime as dt

    from tokenkit_spark.streaming.stats import session_windows

    root = tmp_path_factory.mktemp("sessdist")
    ev_dir, ckpt = str(root / "events"), str(root / "ckpt")
    schema = "event_id long, user_id long, ts timestamp, value double"
    t = lambda m: dt.datetime(2026, 1, 1, 10, 0) + dt.timedelta(minutes=m)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(ev_dir)

    write([(0, 1, t(120), 1.0)])              # open session at 12:00
    write([(1, 1, t(0), 2.0)])                # LATE, 2h earlier, gap is 10min
    write([(9, 99, t(120) + dt.timedelta(days=1), 0.0)])  # flush watermark

    q = (
        session_windows(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(ev_dir),
            gap_minutes=10, watermark="3 hours",
        )
        .writeStream.format("memory").queryName("sess_dist")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    rows = sorted(
        (r for r in spark.sql("SELECT * FROM sess_dist").collect() if r.user_id == 1),
        key=lambda r: r.start_us,
    )
    base = int(dt.datetime(2026, 1, 1, 10, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert len(rows) == 2
    assert (rows[0].start_us, rows[0].end_us, rows[0].n_events) == (base, base, 1)
    two_h = base + 120 * 60 * 1_000_000
    assert (rows[1].start_us, rows[1].end_us, rows[1].n_events) == (two_h, two_h, 1)


def test_session_windows_late_event_widens_not_shrinks(spark, tmp_path_factory):
    """A late-but-within-watermark event from a later micro-batch must
    widen the open session (min start / max end), never shrink its end
    or re-arm the timeout earlier."""
    import datetime as dt

    from tokenkit_spark.streaming.stats import session_windows

    root = tmp_path_factory.mktemp("sesslate")
    ev_dir, ckpt = str(root / "events"), str(root / "ckpt")
    schema = "event_id long, user_id long, ts timestamp, value double"
    t = lambda m: dt.datetime(2026, 1, 1, 10, m)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(ev_dir)

    write([(0, 1, t(10), 1.0)])               # state end = 10:10
    write([(1, 1, t(5), 2.0)])                # LATE (within 30-min watermark)
    write([(9, 99, t(10) + dt.timedelta(days=1), 0.0)])  # flush watermark

    q = (
        session_windows(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(ev_dir),
            gap_minutes=30, watermark="30 minutes",
        )
        .writeStream.format("memory").queryName("sess_late")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    rows = [r for r in spark.sql("SELECT * FROM sess_late").collect() if r.user_id == 1]
    assert len(rows) == 1
    base = int(dt.datetime(2026, 1, 1, 10, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    r = rows[0]
    assert r.start_us == base + 5 * 60 * 1_000_000   # widened down to 10:05
    assert r.end_us == base + 10 * 60 * 1_000_000    # end NOT shrunk
    assert (r.n_events, r.sum_value) == (2, 3.0)
