"""Session-K batch 4: champion lists, cluster pruning, hreflang
reciprocity, sitemap x robots conflicts, Erlang-C capacity, streaming
interval join."""

import datetime as dt

from pyspark.sql import functions as F


# ------------------------------------------------------------ champion lists
def test_champion_union_large_enough_is_exact(spark):
    from tokenkit_spark.index.champion import champion_audit

    docs = spark.createDataFrame(
        [(i, "a b" if i % 2 else "a c") for i in range(10)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "a b")], "query_id long, text string")
    # r >= corpus size: champions cover everything -> perfect overlap
    r0 = champion_audit(docs, q, r=50, k=5).collect()[0]
    assert r0.n_candidates == r0.n_full
    assert r0.topk_overlap == 5 and r0.top1_match == 1


def test_champion_small_r_cuts_candidates(spark):
    from tokenkit_spark.index.champion import champion_audit

    docs = spark.createDataFrame(
        [(i, "common " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "common")], "query_id long, text string")
    r0 = champion_audit(docs, q, r=5, k=5).collect()[0]
    assert r0.n_candidates == 5 and r0.n_full == 40
    # champions are the highest-tf docs, which are exactly the BM25
    # winners for a single-term query -> still exact
    assert r0.topk_overlap == 5


# ----------------------------------------------------------- cluster pruning
def test_cluster_pruning_recall_within_cluster(spark):
    from tokenkit_spark.index.leaders import cluster_pruning_audit

    # two topical clusters with leaders 0 and 4 (leader_mod=4)
    docs = spark.createDataFrame(
        [
            (0, "apple fruit pie"),
            (1, "apple fruit tart"),
            (2, "apple orchard fruit"),
            (4, "linux kernel module"),
            (5, "linux kernel patch"),
            (6, "kernel module linux"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "linux kernel")], "query_id long, text string"
    )
    r0 = cluster_pruning_audit(docs, q, leader_mod=4, k=3).collect()[0]
    assert r0.leader == 4
    assert r0.cluster_size == 3
    assert r0.topk_overlap == 3  # the true top-3 all live in cluster 4


# ------------------------------------------------------ hreflang reciprocity
def test_hreflang_reciprocity_detects_one_way_links(spark):
    from tokenkit_spark.ops.metadirectives import hreflang_reciprocity

    tag = (
        '<link rel="alternate" hreflang="{l}" href="{u}">'
    )
    pages = spark.createDataFrame(
        [
            ("https://a.ex/en",
             "<head>" + tag.format(l="de", u="https://a.ex/de") + "</head>"),
            # de page does NOT link back
            ("https://a.ex/de", "<head></head>"),
            ("https://b.ex/en",
             "<head>" + tag.format(l="fr", u="https://b.ex/fr") + "</head>"),
            ("https://b.ex/fr",
             "<head>" + tag.format(l="en", u="https://b.ex/en") + "</head>"),
        ],
        "url string, html string",
    )
    got = {r.url: r for r in hreflang_reciprocity(pages).collect()}
    assert not got["https://a.ex/en"].all_reciprocal
    assert got["https://b.ex/en"].all_reciprocal
    assert got["https://b.ex/fr"].all_reciprocal
    assert "https://a.ex/de" not in got  # no annotations -> no row


# ------------------------------------------------------------ Erlang capacity
def test_erlang_capacity_monotone_in_load(spark):
    from tokenkit_spark.index.capacity import erlang_capacity

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # 'hot' sees 10x the traffic of 'cold' over the same 1000s horizon
    for i in range(1000):
        rows.append((i, "hot", t0 + dt.timedelta(seconds=i)))
    for i in range(100):
        rows.append((10_000 + i, "cold", t0 + dt.timedelta(seconds=10 * i)))
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = {r.event_type: r for r in erlang_capacity(ev).collect()}
    assert got["hot"].c_required > got["cold"].c_required
    assert got["hot"].p_wait <= 0.05
    # c must exceed offered load for a stable queue
    assert got["hot"].c_required > got["hot"].offered_a


def test_erlang_capacity_pwait_decreases_with_c(spark):
    """Sanity on the formula itself via the module's internal sweep:
    the picked c is minimal — c-1 violates the SLO (or is <= a)."""
    import math

    def p_wait(c, a):
        if c <= a:
            return 1.0
        s = sum(a ** k / math.factorial(k) for k in range(c))
        t = a ** c / math.factorial(c) * (c / (c - a))
        return t / (s + t)

    a = 2.0
    cs = [c for c in range(1, 21) if p_wait(c, a) <= 0.05]
    c_req = min(cs)
    assert p_wait(c_req, a) <= 0.05
    assert p_wait(c_req - 1, a) > 0.05


# ----------------------------------------------------- streaming interval join
def _write_batch(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_stream_click_attribution(spark, tmp_path_factory):
    """Watermarked interval join across micro-batches: clicks join
    impressions of the same (user, item) within 5 minutes, including
    pairs split across batches; outside-window clicks drop; output
    equals the batch twin."""
    from tokenkit_spark.streaming.joins import (
        attribute_clicks,
        attribute_clicks_batch,
    )

    root = tmp_path_factory.mktemp("ssjoin")
    imp_dir, clk_dir = str(root / "imp"), str(root / "clk")
    ckpt = str(root / "ckpt")
    t = lambda m, s=0: dt.datetime(2026, 1, 1, 0, m, s)
    schema_i = "user_id long, item_id long, ts timestamp"
    # batch 1: impressions
    _write_batch(spark, [(1, 10, t(0)), (2, 20, t(1))], schema_i, imp_dir)
    _write_batch(spark, [(1, 10, t(2))], schema_i, clk_dir)  # in-window
    # batch 2: a cross-batch click + an out-of-window click
    _write_batch(spark, [(3, 30, t(3))], schema_i, imp_dir)
    _write_batch(
        spark, [(2, 20, t(4)), (1, 10, t(30))], schema_i, clk_dir
    )

    imp = spark.readStream.schema(schema_i).option(
        "maxFilesPerTrigger", 1
    ).parquet(imp_dir)
    clk = spark.readStream.schema(schema_i).option(
        "maxFilesPerTrigger", 1
    ).parquet(clk_dir)
    q = (
        attribute_clicks(imp, clk, window_minutes=5)
        .writeStream.format("memory").queryName("attr_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.item_id, r.lag_seconds)
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    assert got == {(1, 10, 120), (2, 20, 180)}
    want = {
        (r.user_id, r.item_id, r.lag_seconds)
        for r in attribute_clicks_batch(
            spark.read.parquet(imp_dir), spark.read.parquet(clk_dir), 5
        ).collect()
    }
    assert got == want


# ------------------------------------------------------------------- Soundex
def test_soundex_canonical_vectors(spark):
    from tokenkit_spark.analyzers.filters import soundex_col

    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Ashcraft",), ("Ashcroft",),
         ("Tymczak",), ("Pfister",), ("Honeyman",), ("",), ("123",)],
        "term string",
    ).select("term", soundex_col("term").alias("sdx"))
    got = {r.term: r.sdx for r in df.collect()}
    assert got["Robert"] == "R163" and got["Rupert"] == "R163"
    assert got["Ashcraft"] == "A261" and got["Ashcroft"] == "A261"
    assert got["Tymczak"] == "T522"
    assert got["Pfister"] == "P236"
    assert got["Honeyman"] == "H555"
    assert got[""] is None and got["123"] is None


# ------------------------------------------------------------------ URL dates
def test_url_date_stats_extraction(spark):
    from tokenkit_spark.ops.webclean import url_date_stats

    urls = spark.createDataFrame(
        [
            ("h", "https://h.ex/2023/11/post"),
            ("h", "https://h.ex/2021/3/old"),
            ("h", "https://h.ex/about"),
        ],
        "host string, url string",
    )
    r = url_date_stats(urls).collect()[0]
    assert r.n_urls == 3 and r.n_dated == 2
    assert r.min_ym == 202103 and r.max_ym == 202311
    assert abs(r.dated_frac - round(2 / 3, 4)) < 1e-9


# ------------------------------------------------------------ burn-rate alerts
def test_burn_rate_pages_on_sustained_incident(spark):
    import datetime as dt

    from tokenkit_spark.ops.events import burn_rate_alerts

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # 120 healthy minutes, one event/min, then a 10-min full outage
    for i in range(120):
        rows.append((t0 + dt.timedelta(minutes=i), False))
    for i in range(120, 130):
        rows.append((t0 + dt.timedelta(minutes=i), True))
    ev = spark.createDataFrame(rows, "ts timestamp, is_error boolean")
    out = burn_rate_alerts(ev).collect()
    assert out, "a full outage must alert"
    assert any(r.page_alert for r in out)
    # no alerts during the healthy prefix
    healthy_end = int(
        (t0 + dt.timedelta(minutes=119)).timestamp()
    )
    assert all(r.minute_epoch > healthy_end for r in out)


# --------------------------------------------------------------- trimmed mean
def test_trimmed_mean_ignores_outlier(spark):
    from tokenkit_spark.ops.aggs import trimmed_mean

    rows = [(i, "t", float(v)) for i, v in enumerate(
        [10, 10, 10, 10, 10, 10, 10, 10, 10, 100000]
    )]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    r = trimmed_mean(ev).collect()[0]
    assert r.n == 10 and r.n_trimmed == 8
    assert r.trimmed_mean == 10.0
    assert r.mean_all > 100


# ------------------------------------------------------------ robots conflicts
def test_robots_conflicts_header_vs_meta(spark):
    from tokenkit_spark.ops.metadirectives import robots_conflicts

    pages = spark.createDataFrame(
        [
            # agree: both noindex
            ("a", "X-Robots-Tag: noindex\n",
             '<head><meta name="robots" content="noindex"></head>'),
            # conflict: header says all, meta says noindex
            ("a", "X-Robots-Tag: all\n",
             '<head><meta name="robots" content="noindex"></head>'),
            # only meta
            ("a", "HTTP/1.1 200 OK\n",
             '<head><meta name="robots" content="noindex"></head>'),
            # neither
            ("a", "HTTP/1.1 200 OK\n", "<head></head>"),
        ],
        "host string, headers string, html string",
    )
    r = robots_conflicts(pages).collect()[0]
    assert r.n_pages == 4
    assert r.n_both_channels == 2
    assert r.n_conflicts == 1
    assert r.n_effective_noindex == 3
