"""Session-L batch 10: percentiles_bucket, funnel latency, rich club,
RLE layout, log release pipeline, crawl makespan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ------------------------------------------------------- percentiles bucket
def test_percentiles_bucket_interpolation(spark):
    from tokenkit_spark.ops.events import percentiles_bucket

    rows = []
    # daily counts 1, 2, 3, 4 over four days
    for day in range(1, 5):
        for _ in range(day):
            rows.append((dt.datetime(2024, 1, day), 1, "a", 1.0))
    out = {r.pct: r for r in percentiles_bucket(
        _ev(spark, rows), percentiles=(0.5, 1.0)
    ).collect()}
    assert out[0.5].n_buckets == 4
    # percentile_cont(0.5) of [1,2,3,4] = 2.5
    assert out[0.5].value == pytest.approx(2.5)
    assert out[1.0].value == pytest.approx(4.0)


# ---------------------------------------------------------- funnel latency
def test_funnel_latency_first_pair(spark):
    from tokenkit_spark.ops.events import funnel_latency

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # u1 converts after 100s (first purchase at-or-after first view)
        (base, 1, "view", 1.0),
        (base + dt.timedelta(seconds=100), 1, "purchase", 1.0),
        (base + dt.timedelta(seconds=900), 1, "purchase", 1.0),
        # u2 never converts
        (base, 2, "view", 1.0),
        # u3 purchased BEFORE viewing -> not a conversion of this funnel
        (base - dt.timedelta(seconds=50), 3, "purchase", 1.0),
        (base, 3, "view", 1.0),
    ]
    r = funnel_latency(_ev(spark, rows)).collect()[0]
    assert r.n_start_users == 3 and r.n_converted == 1
    assert r.mean_s == pytest.approx(100.0)
    assert r.conversion_rate == pytest.approx(1 / 3, abs=1e-5)


# --------------------------------------------------------------- rich club
def test_rich_club_clique_plus_leaves(spark):
    from tokenkit_spark.ops.linkgraph import rich_club

    edges = []
    # triangle among 0,1,2 (hubs)
    edges += [(0, 1), (1, 2), (0, 2)]
    # leaves hanging off each hub
    nid = 10
    for h in range(3):
        for _ in range(3):
            edges.append((h, nid))
            nid += 1
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r.k: r for r in rich_club(e, k_values=(1, 4)).collect()}
    # degree > 4: exactly the 3 hubs (degree 5), fully interconnected
    assert out[4].n_rich == 3 and out[4].e_rich == 3
    assert out[4].phi == pytest.approx(1.0)
    # k=1 includes leaves (degree 1 excluded) -> only hubs again
    assert out[1].n_rich == 3


# --------------------------------------------------------------- rle audit
def test_rle_runs_exact(spark):
    from tokenkit_spark.index.layout import rle_layout_audit

    rows = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a"), (3, "b"), (4, "a"), (5, "b")],
        "doc_id long, source string",
    )
    r = rle_layout_audit(rows, "source").collect()[0]
    # alternating in docid order -> 6 runs; sorted -> 2 runs
    assert r.runs_docid == 6 and r.runs_sorted == 2
    assert r.rle_gain == pytest.approx(3.0)
    assert r.n_distinct == 2


# ------------------------------------------------------------- log release
def test_log_release_stages(spark):
    from tokenkit_spark.ops.searchlog import log_release_pipeline

    rows = []
    # 'common query' by 5 users (passes both gates)
    for u in range(5):
        rows.append((u, 1, "common query"))
    # 'niche secretword' by 3 users (passes k=3, fails term gate < 5)
    for u in (10, 11, 12):
        rows.append((u, 1, "niche secretword"))
    # singleton query (fails k)
    rows.append((20, 1, "lonely search"))
    qlog = spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )
    out = {r.stage: r for r in log_release_pipeline(
        qlog, k=3, min_term_users=5, user_col="session_id"
    ).collect()}
    assert out[0].n_rows_kept == 9
    assert out[1].n_rows_kept == 8      # lonely dropped
    assert out[2].n_rows_kept == 5      # niche dropped by term gate
    assert out[2].n_queries_kept == 1


# ---------------------------------------------------------- crawl makespan
def test_crawl_makespan_binding(spark):
    from tokenkit_spark.ops.frontier import crawl_makespan_bound

    demands = spark.createDataFrame(
        [("a", 1000.0), ("b", 10.0), ("c", 10.0)],
        "host string, demand double",
    )
    r = crawl_makespan_bound(
        demands, politeness_s=1.0, connections=64
    ).collect()[0]
    # head: 1000s; bandwidth: 1020/64 ~ 16s -> politeness binds
    assert r.binding == "politeness_head"
    assert r.makespan_lb_s == pytest.approx(1000.0)
    assert r.utilization < 0.05
