"""Kleinberg burst detection (ops/bursts.py), Katz centrality and
degree assortativity (ops/linkgraph.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops.bursts import kleinberg_bursts
from tokenkit_spark.ops.linkgraph import degree_assortativity, top_katz


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )


def _day(d):
    return dt.datetime(2024, 1, d, 12, 0, 0)


def test_burst_detected_on_sustained_spike(spark):
    # type 'a': 2/day baseline for 20 days except days 10-13 at 20/day;
    # type 'b': flat 8/day. The spike must surface as one burst.
    rows = []
    eid = 0
    for day in range(1, 21):
        na = 20 if 10 <= day <= 13 else 2
        for _ in range(na):
            rows.append((eid, _day(day), "a")); eid += 1
        for _ in range(8):
            rows.append((eid, _day(day), "b")); eid += 1
    out = kleinberg_bursts(_events(spark, rows), s=2.0, gamma=1.0).collect()
    bursts_a = [r for r in out if r.event_type == "a"]
    assert len(bursts_a) == 1
    b = bursts_a[0]
    assert b.start_day == dt.date(2024, 1, 10)
    assert b.end_day == dt.date(2024, 1, 13)
    assert b.n_days == 4 and b.weight > 0


def test_no_burst_on_flat_stream(spark):
    rows = []
    eid = 0
    for day in range(1, 15):
        for t in ("a", "b"):
            for _ in range(5):
                rows.append((eid, _day(day), t)); eid += 1
    assert kleinberg_bursts(_events(spark, rows), s=2.0, gamma=1.0).count() == 0


def test_burst_weight_is_fit_saving_sum(spark):
    # One-day extreme spike: weight equals that day's fit0 - fit1,
    # recomputed independently.
    import numpy as np

    rows = []
    eid = 0
    for day in range(1, 11):
        na = 50 if day == 5 else 1
        for _ in range(na):
            rows.append((eid, _day(day), "a")); eid += 1
        for _ in range(10):
            rows.append((eid, _day(day), "b")); eid += 1
    out = kleinberg_bursts(_events(spark, rows), s=2.0, gamma=1.0).collect()
    a = [r for r in out if r.event_type == "a"]
    assert len(a) == 1 and a[0].n_days == 1
    R, D = 59, 159
    p0 = R / D
    p1 = min(0.99, 2 * p0)
    r, d = 50, 60
    fit = lambda p: -(r * np.log(p) + (d - r) * np.log(1 - p))
    assert a[0].weight == pytest.approx(fit(p0) - fit(p1), abs=1e-4)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_katz_favors_high_indegree(spark):
    # star: 1..5 -> 0; node 0 must rank first with katz 1 + 5*alpha
    # (+ higher-order terms zero: sources have no in-edges -> x=1).
    e = _edges(spark, [(i, 0) for i in range(1, 6)])
    out = top_katz(e, n_iter=5, alpha=0.1, k=3).collect()
    assert out[0].node == 0
    assert out[0].katz == pytest.approx(1.5)
    assert all(r.katz == pytest.approx(1.0) for r in out[1:])


def test_katz_chain_attenuates(spark):
    # chain 3->2->1->0: x(0) = 1 + a + a^2 + a^3 at n_iter >= 3.
    e = _edges(spark, [(3, 2), (2, 1), (1, 0)])
    out = {r.node: r.katz for r in top_katz(e, n_iter=5, alpha=0.1).collect()}
    assert out[0] == pytest.approx(1.111, abs=1e-3)
    assert out[3] == pytest.approx(1.0)


def test_assortativity_star_is_negative(spark):
    # Star graphs are maximally disassortative.
    e = _edges(spark, [(0, i) for i in range(1, 7)])
    out = degree_assortativity(e).collect()[0]
    assert out.n_edges == 6
    assert out.assortativity == pytest.approx(-1.0, abs=1e-6)


def test_assortativity_regular_components(spark):
    # Two disjoint triangles: every endpoint degree is 2 -> correlation
    # degenerate; a 4-cycle + triangle mix gives a defined value in
    # [-1, 1]. Use a path of 4 (degrees 1,2,2,1) -> r = -0.5.
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    out = degree_assortativity(e).collect()[0]
    assert out.assortativity == pytest.approx(-0.5, abs=1e-6)
