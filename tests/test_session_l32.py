"""Session-L batch 32: histogram quantile audit, robust z, gap sweep."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


def test_hist_quantile_bounded_error(spark):
    from tokenkit_spark.ops.aggs import hist_quantile_audit

    rows = [
        (dt.datetime(2024, 1, 1), i, "a", float(i)) for i in range(1000)
    ]
    out = {r.p: r for r in hist_quantile_audit(
        _ev(spark, rows), n_buckets=100
    ).collect()}
    # values 0..999, 100 buckets of width ~10: the histogram answers
    # within one bucket width above the exact quantile
    for p in (0.5, 0.9, 0.99):
        r = out[p]
        assert r.hist_q >= r.exact_q - 1e-9
        assert r.hist_q - r.exact_q <= 999 / 100 + 1e-6
    assert out[0.5].exact_q == pytest.approx(499.5)


def test_robust_z_flags_spike_not_poisoned(spark):
    from tokenkit_spark.ops.changepoint import robust_zscore_daily

    rows = []
    # 14 quiet days of 10 events, one day with 300 (the spike)
    for d in range(14):
        for i in range(10):
            rows.append((dt.datetime(2024, 1, 1 + d, 8 + i % 10), 1,
                         "a", 1.0))
    for i in range(300):
        rows.append(
            (dt.datetime(2024, 1, 15, i % 24, i % 60), 1, "a", 1.0)
        )
    out = {r.day: r for r in robust_zscore_daily(_ev(spark, rows))
           .collect()}
    # MAD is 0-resistant here: median 10, deviations all 0 except
    # spike -> mad 0 -> null z on spike... use slight variation
    # instead: every day exactly 10 means mad=0; check null handling
    spike = out["2024-01-15"]
    assert spike.med == 10.0 and spike.mad == 0.0
    assert spike.robust_z is None and not spike.is_anomaly


def test_robust_z_with_variation(spark):
    from tokenkit_spark.ops.changepoint import robust_zscore_daily

    rows = []
    # counts 8..12 cycling, then a 300-event day
    for d in range(15):
        for i in range(8 + d % 5):
            rows.append((dt.datetime(2024, 2, 1 + d, 8, i), 1, "a", 1.0))
    for i in range(300):
        rows.append((dt.datetime(2024, 2, 16, i % 24, i % 60), 1,
                     "a", 1.0))
    out = {r.day: r for r in robust_zscore_daily(_ev(spark, rows))
           .collect()}
    assert out["2024-02-16"].is_anomaly
    assert not out["2024-02-01"].is_anomaly
    # the spike doesn't poison the baseline: median stays ~10
    assert out["2024-02-16"].med == pytest.approx(10.0, abs=1.0)


def test_session_gap_sweep_monotone(spark):
    from tokenkit_spark.ops.events import session_gap_sweep

    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    # user 1: events at 0, 15min, 65min -> gaps 15min and 50min
    for m in (0, 15, 65):
        rows.append((base + dt.timedelta(minutes=m), 1, "a", 1.0))
    # user 2: single event
    rows.append((base, 2, "a", 1.0))
    out = {r.gap_min: r for r in session_gap_sweep(_ev(spark, rows))
           .collect()}
    # T=10: both gaps break -> 2 + 2 sessions... user1 contributes 2
    # breaks + user2 none -> n_sessions = 2 users + 2 breaks = 4
    assert out[10].n_sessions == 4
    assert out[30].n_sessions == 3  # only the 50-min gap breaks
    assert out[60].n_sessions == 2  # no gap breaks
    # break share n_breaks/n_gaps = 1/2 at T=30
    assert out[30].n_breaks * 2 == out[30].n_gaps
    # session count is monotone non-increasing in the threshold
    assert out[10].n_sessions >= out[30].n_sessions >= out[60].n_sessions
