"""Session-L batch 4: DFR IFB2, anytime impact curve, HTTP cache
freshness, Shewhart/Western-Electric rules, MASE, knn(k) profile."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ------------------------------------------------------------------- ifb2
def test_ifb2_prefers_rare_term_doc(spark):
    from tokenkit_spark.index.lmsim import dfr_ifb2

    docs = spark.createDataFrame(
        [(0, "rare common"), (1, "common common"), (2, "common filler")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "rare")], "query_id long, text string")
    out = dfr_ifb2(docs, q).collect()
    assert out[0].doc_id == 0 and out[0].rank == 1
    assert out[0].score > 0


def test_ifb2_matches_hand_formula(spark):
    import math

    from tokenkit_spark.index.lmsim import dfr_ifb2

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b c")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(0, "a")], "query_id long, text string")
    r = dfr_ifb2(docs, q).collect()[0]
    # N=2 docs, avgdl=2, dl=2, tf=1, cf=1, df=1
    tfn = 1 * math.log2(1 + 2 / 2)  # = 1
    w = (1 + 1) / (1 * (tfn + 1)) * tfn * math.log2((2 + 1) / 1.5)
    assert r.score == pytest.approx(round(w, 4))


# ---------------------------------------------------------- anytime curve
def test_anytime_full_budget_is_exact(spark):
    from tokenkit_spark.index.impact import anytime_curve

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} shared") for i in range(30)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "shared w1")], "query_id long, text string"
    )
    out = anytime_curve(docs, q, budgets=(0.5, 1.0), k=5).collect()
    by_b = {r.budget_frac: r for r in out}
    assert by_b[1.0].topk_overlap == 5 and by_b[1.0].top1_match == 1
    assert by_b[1.0].n_used == by_b[1.0].n_postings
    assert by_b[0.5].n_used <= by_b[1.0].n_used // 2 + 1


def test_anytime_budget_monotone_overlap(spark):
    from tokenkit_spark.index.impact import anytime_curve

    docs = spark.createDataFrame(
        [(i, ("hot " * (1 + i % 4)) + f"tail{i}") for i in range(40)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "hot")], "query_id long, text string")
    out = {
        r.budget_frac: r.topk_overlap
        for r in anytime_curve(docs, q, budgets=(0.1, 0.5, 1.0), k=5)
        .collect()
    }
    assert out[0.1] <= out[0.5] <= out[1.0] == 5


# ------------------------------------------------------------- http cache
def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, headers string")


def test_http_cache_resolution_order(spark):
    from tokenkit_spark.ops.httpmeta import cache_freshness_audit

    d = "Date: Mon, 15 Jan 2024 10:00:00 GMT\n"
    rows = [
        # max-age wins over Expires
        ("h", d + "Cache-Control: max-age=60\n"
               "Expires: Mon, 15 Jan 2024 12:00:00 GMT\n"),
        # Expires - Date = 2h
        ("h", d + "Expires: Mon, 15 Jan 2024 12:00:00 GMT\n"),
        # heuristic: 10% of (10:00 - 00:00) = 3600s
        ("h", d + "Last-Modified: Mon, 15 Jan 2024 00:00:00 GMT\n"),
        # no-store wins over everything
        ("h", d + "Cache-Control: no-store, max-age=999\n"),
        ("h", d),
    ]
    r = cache_freshness_audit(_pages(spark, rows)).collect()[0]
    assert r.n_pages == 5
    assert r.n_no_store == 1 and r.n_explicit == 2
    assert r.n_heuristic == 1 and r.n_uncacheable == 1
    assert r.max_fresh_s == 7200
    # lifetimes: 60, 7200, 3600, 0, 0
    assert r.mean_fresh_s == pytest.approx((60 + 7200 + 3600) / 5)
    assert r.frac_cacheable == pytest.approx(0.6)


# --------------------------------------------------------------- shewhart
def test_shewhart_rule1_spike(spark):
    from tokenkit_spark.ops.changepoint import shewhart_rules

    rows = []
    for day in range(1, 21):
        n = 10 if day != 15 else 60  # big spike on day 15
        n += day % 2  # wiggle so sigma > 0
        for _ in range(n):
            rows.append((dt.datetime(2024, 1, day, 12, 0), 1, "a", 1.0))
    out = shewhart_rules(_ev(spark, rows)).collect()
    spike_day = (dt.date(2024, 1, 15) - dt.date(1970, 1, 1)).days
    spike = [r for r in out if r.day == spike_day][0]
    assert spike.r1 and spike.any_signal
    quiet = [r for r in out if r.day != spike_day]
    assert all(not r.r1 for r in quiet)


def test_shewhart_rule4_level_shift(spark):
    from tokenkit_spark.ops.changepoint import shewhart_rules

    rows = []
    for day in range(1, 25):
        n = 10 if day <= 12 else 14  # sustained shift, both sides wiggle
        n += day % 2
        for _ in range(n):
            rows.append((dt.datetime(2024, 1, day, 12, 0), 1, "a", 1.0))
    out = sorted(
        shewhart_rules(_ev(spark, rows)).collect(), key=lambda r: r.day
    )
    # after 8 consecutive high-side days the run rule must fire
    assert any(r.r4 for r in out[12:])
    # a run of < 8 points can never fire it
    assert not any(r.r4 for r in out[:7])


# ------------------------------------------------------------------- mase
def test_mase_perfect_weekly_cycle(spark):
    from tokenkit_spark.ops.trend import mase_eval

    rows = []
    for day in range(1, 29):
        n = [5, 5, 5, 5, 5, 20, 20][(day - 1) % 7]  # weekend spikes
        for _ in range(n):
            rows.append((dt.datetime(2024, 1, day, 12, 0), 1, "a", 1.0))
    r = mase_eval(_ev(spark, rows)).collect()[0]
    # seasonal naive is PERFECT on an exact weekly cycle
    assert r.mae_snaive == 0.0
    assert r.mae_naive1 > 0
    assert r.better_baseline == "seasonal"


# -------------------------------------------------------- neighbor degree
def test_neighbor_degree_star_graph(spark):
    from tokenkit_spark.ops.linkgraph import neighbor_degree_profile

    # star: hub 0 connected to 1..5
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = {r.k: r for r in neighbor_degree_profile(edges).collect()}
    # leaves: degree 1, their only neighbor (hub) has degree 5
    assert out[1].n_nodes == 5 and out[1].avg_knn == pytest.approx(5.0)
    # hub: degree 5, all neighbors degree 1 -> disassortative signature
    assert out[5].n_nodes == 1 and out[5].avg_knn == pytest.approx(1.0)
