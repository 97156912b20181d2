"""Event-stream analytics tests: sessionize, date_histogram, cardinality."""

import datetime as dt

import pytest
from pyspark.sql import Row

from tokenkit_spark.ops import events as ev_ops


def _ts(minute, second=0):
    return dt.datetime(2024, 3, 1, 12, minute, second)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        Row(event_id=0, user_id=1, ts=_ts(0), value=1.0),
        Row(event_id=1, user_id=1, ts=_ts(10), value=2.0),
        Row(event_id=2, user_id=1, ts=_ts(55), value=4.0),
        # user 2: one session, tie timestamps broken by event_id
        Row(event_id=3, user_id=2, ts=_ts(5), value=1.5),
        Row(event_id=4, user_id=2, ts=_ts(5), value=2.5),
        # user 3: single event
        Row(event_id=5, user_id=3, ts=_ts(30), value=7.0),
    ]
    return spark.createDataFrame(rows).cache()


def test_sessionize_gap_split(ev):
    out = {
        (r.user_id, r.event_id): r.session_id
        for r in ev_ops.sessionize(ev, gap_minutes=30).collect()
    }
    assert out[(1, 0)] == 0 and out[(1, 1)] == 0   # 10-min gap: same session
    assert out[(1, 2)] == 1                        # 45-min gap: new session
    assert out[(2, 3)] == 0 and out[(2, 4)] == 0
    assert out[(3, 5)] == 0


def test_session_stats(ev):
    rows = {
        (r.user_id, r.session_id): r
        for r in ev_ops.session_stats(ev, gap_minutes=30, value_col="value").collect()
    }
    s = rows[(1, 0)]
    assert s.n_events == 2 and s.sum_value == 3.0
    assert s.duration_us == 10 * 60 * 1_000_000
    assert rows[(1, 1)].n_events == 1 and rows[(1, 1)].duration_us == 0
    # epoch micros are absolute (tz-independent): 2024-03-01T12:00:00Z
    assert s.start_us == int(dt.datetime(2024, 3, 1, 12, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000


def test_sessionize_rejects_bad_gap(ev):
    with pytest.raises(ValueError):
        ev_ops.sessionize(ev, gap_minutes=0)


def test_date_histogram_intervals(ev):
    out = {
        r.bucket: r.n_events
        for r in ev_ops.date_histogram(ev, interval="hour").collect()
    }
    assert out == {"2024-03-01 12:00:00": 6}
    with pytest.raises(ValueError):
        ev_ops.date_histogram(ev, interval="fortnight")


def test_date_histogram_group_and_sum(spark):
    rows = [
        Row(event_id=i, kind="a" if i % 2 == 0 else "b",
            ts=dt.datetime(2024, 3, 1 + i % 3), value=float(i))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    out = ev_ops.date_histogram(df, interval="day", group_cols=("kind",), value_col="value")
    got = {(r.bucket, r.kind): (r.n_events, r.sum_value) for r in out.collect()}
    assert got[("2024-03-01 00:00:00", "a")] == (2, 0.0 + 6.0)
    assert got[("2024-03-02 00:00:00", "b")] == (2, 1.0 + 7.0)


def test_cardinality_error_bound(spark):
    # 3 groups x known distinct counts; HLL++ at rsd=0.02 must land within 5%
    rows = [
        Row(g=f"g{gi}", u=ui)
        for gi, n in enumerate((50, 500, 2000))
        for ui in range(n)
    ]
    df = spark.createDataFrame(rows)
    approx = {r.g: r.approx_distinct for r in ev_ops.cardinality(df, "g", "u").collect()}
    for g, exact in (("g0", 50), ("g1", 500), ("g2", 2000)):
        assert abs(approx[g] - exact) / exact <= 0.05


def test_extended_stats(spark):
    import math

    rows = [Row(event_id=i, kind="a" if i < 4 else "b", value=float(v))
            for i, v in enumerate([1, 2, 3, 4, 10, 10])]
    df = spark.createDataFrame(rows)
    got = {r.kind: r for r in ev_ops.extended_stats(df, "kind", "value").collect()}
    a = got["a"]
    assert (a.n, a.min_v, a.max_v, a.sum_v, a.avg_v) == (4, 1.0, 4.0, 10.0, 2.5)
    # ES computes the POPULATION std dev (sum_of_squares/n - avg^2)
    assert a.std_v == round(math.sqrt(sum((x - 2.5) ** 2 for x in [1, 2, 3, 4]) / 4), 4)
    assert got["b"].std_v == 0.0


def test_date_histogram_pipeline(spark):
    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 3, 1 + d), value=float(v))
        for i, (d, v) in enumerate([(0, 10), (0, 10), (1, 40), (2, 10), (3, 100)])
    ]
    df = spark.createDataFrame(rows)
    out = {r.bucket: r for r in
           ev_ops.date_histogram_pipeline(df, value_col="value", window=3).collect()}
    d1, d2, d3, d4 = (f"2024-03-0{i} 00:00:00" for i in (1, 2, 3, 4))
    assert out[d1].derivative is None            # ES: first bucket has none
    assert out[d1].moving_avg is None            # moving_fn: empty window
    assert out[d2].derivative == 20.0            # 40 - 20
    assert out[d2].moving_avg == 20.0            # avg(20) — current excluded
    assert out[d3].moving_avg == 30.0            # avg(20, 40)
    assert out[d4].moving_avg == round((20 + 40 + 10) / 3, 4)
    with pytest.raises(ValueError):
        ev_ops.date_histogram_pipeline(df, window=0)


def test_date_histogram_pipeline_zero_fills_gaps(spark):
    """ES min_doc_count=0: empty calendar buckets are emitted, and
    pipeline aggs run over the gap-free sequence — a moving average must
    see the zero day, not silently span the gap."""
    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 3, day), value=float(v))
        for i, (day, v) in enumerate([(1, 10), (2, 20), (4, 40)])
    ]
    df = spark.createDataFrame(rows)
    out = {r.bucket: r for r in
           ev_ops.date_histogram_pipeline(df, value_col="value", window=2).collect()}
    d3 = "2024-03-03 00:00:00"
    assert set(out) == {f"2024-03-0{i} 00:00:00" for i in (1, 2, 3, 4)}
    assert (out[d3].n_events, out[d3].sum_value) == (0, 0.0)
    assert out[d3].derivative == -20.0           # 0 - 20
    assert out[d3].moving_avg == 15.0            # avg(10, 20)
    d4 = "2024-03-04 00:00:00"
    assert out[d4].derivative == 40.0            # 40 - 0
    assert out[d4].moving_avg == 10.0            # avg(20, 0)
