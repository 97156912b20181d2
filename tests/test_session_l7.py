"""Session-L batch 7: Fagin TA, skyline, association rules, EB CTR
shrinkage, PSI drift, difference-in-differences."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# --------------------------------------------------------------- fagin ta
def test_fagin_ta_stops_early_on_correlated_lists(spark):
    from tokenkit_spark.index.rankjoin import fagin_ta_audit

    # perfectly correlated: both lists rank identically
    a = spark.createDataFrame(
        [(i, float(1000 - i)) for i in range(200)],
        "doc_id long, score double",
    )
    out = fagin_ta_audit(a, a, k=5).collect()
    stopped = [r for r in out if r.stopped]
    assert stopped
    # with identical rankings, TA stops by depth 8 (first grid >= 5)
    assert min(r.depth for r in stopped) <= 8
    assert all(r.topk_exact for r in out)


def test_fagin_ta_anticorrelated_scans_deep(spark):
    from tokenkit_spark.index.rankjoin import fagin_ta_audit

    n = 64
    a = spark.createDataFrame(
        [(i, float(i)) for i in range(n)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(i, float(n - i)) for i in range(n)], "doc_id long, score double"
    )
    out = fagin_ta_audit(a, b, k=5).collect()
    stop = max(r.depth for r in out)
    # anti-correlated lists force a much deeper scan than correlated
    assert stop >= n // 4
    assert all(r.topk_exact for r in out)


# ---------------------------------------------------------------- skyline
def test_skyline_hand_case(spark):
    from tokenkit_spark.ops.skyline import pareto_skyline

    pts = spark.createDataFrame(
        [
            (0, 10.0, 1.0),   # skyline (max x)
            (1, 5.0, 5.0),    # skyline
            (2, 1.0, 10.0),   # skyline (max y)
            (3, 4.0, 4.0),    # dominated by 1
            (4, 10.0, 1.0),   # tie with 0 on both dims -> not dominated
            (5, 0.5, 0.5),    # dominated by everyone
        ],
        "doc_id long, x double, y double",
    )
    out = {r.id for r in pareto_skyline(pts, "x", "y").collect()}
    assert out == {0, 1, 2, 4}


# ------------------------------------------------------------- assoc rules
def test_association_rules_confidence_lift(spark):
    from tokenkit_spark.ops.aggs import association_rules

    # 10 baskets: {a,b} x6, {a} x2, {b} x1, {c} x1
    rows = []
    bid = 0
    for _ in range(6):
        rows += [(bid, "a"), (bid, "b")]
        bid += 1
    for _ in range(2):
        rows.append((bid, "a"))
        bid += 1
    rows.append((bid, "b"))
    bid += 1
    rows.append((bid, "c"))
    baskets = spark.createDataFrame(rows, "doc_id long, item string")
    out = {(r.a, r.b): r for r in association_rules(
        baskets, min_support=2, k=10
    ).collect()}
    r = out[("a", "b")]
    assert r.n_ab == 6
    assert r.support == pytest.approx(0.6)
    assert r.confidence == pytest.approx(6 / 8)
    # lift = conf / P(b) = 0.75 / 0.7
    assert r.lift == pytest.approx(0.75 / 0.7, abs=1e-5)
    assert r.leverage == pytest.approx(0.6 - 0.8 * 0.7, abs=1e-5)


# ------------------------------------------------------------------ eb ctr
def test_eb_ctr_shrinks_low_traffic_toward_prior(spark):
    from tokenkit_spark.ops.clicks import eb_ctr_shrinkage

    rows = []
    # 20 items with 100 views each at ~20% ctr (stable marginal)
    for i in range(20):
        n_click = 15 + (i % 10)  # 15..24 clicks
        rows += [(f"big{i}", True)] * n_click
        rows += [(f"big{i}", False)] * (100 - n_click)
    # one lucky item: 1 view, 1 click (raw ctr 1.0)
    rows.append(("lucky", True))
    log = spark.createDataFrame(rows, "item string, clicked boolean")
    out = {r.item: r for r in eb_ctr_shrinkage(log, k=30).collect()}
    lucky = out["lucky"]
    assert lucky.ctr_raw == 1.0
    # shrunk far below 1.0, toward the ~0.2 prior
    assert lucky.ctr_eb < 0.6
    big = out["big5"]
    # high-traffic items barely move
    assert abs(big.ctr_eb - big.ctr_raw) < 0.05


# --------------------------------------------------------------- psi drift
def test_psi_detects_shift(spark):
    from tokenkit_spark.ops.divergence import psi_drift

    rows = []
    # 'stable': same uniform values both halves
    for day in (5, 25):
        for v in range(100):
            rows.append(
                (dt.datetime(2024, 1, day), 1, "stable", float(v % 500))
            )
    # 'shifted': low values pre, high values post
    for v in range(100):
        rows.append((dt.datetime(2024, 1, 5), 1, "shifted", 10.0))
        rows.append((dt.datetime(2024, 1, 25), 1, "shifted", 480.0))
    out = {r.grp: r for r in psi_drift(
        _ev(spark, rows), split_ts="2024-01-16 00:00:00"
    ).collect()}
    assert out["stable"].drift_level == "stable"
    assert out["stable"].psi < 0.01
    assert out["shifted"].drift_level == "major_drift"
    assert out["shifted"].psi > 1.0


# --------------------------------------------------------------------- did
def test_did_removes_baseline_gap(spark):
    from tokenkit_spark.ops.abtest import did_estimate

    rows = []
    for u in range(40):
        treat = u % 2 == 1
        base = 100.0 if treat else 50.0  # persistent group gap
        rows.append((dt.datetime(2024, 1, 5), u, "a", base))
        # post: both grow by 10; treatment adds 7 more
        post = base + 10.0 + (7.0 if treat else 0.0)
        rows.append((dt.datetime(2024, 1, 25), u, "a", post))
    r = did_estimate(
        _ev(spark, rows), split_ts="2024-01-16 00:00:00"
    ).collect()[0]
    assert r.did == pytest.approx(7.0)
    # the naive post-only comparison wrongly includes the 50-pt gap
    assert r.naive_post_diff == pytest.approx(57.0)
