"""Session-L batch 22: ES latest transform, DAU/MAU, score
calibration, doc visibility, partition pruning."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


# ---------------------------------------------------------------- es latest
def test_latest_transform_deterministic_tiebreak(spark):
    from tokenkit_spark.ops.events import latest_transform

    t = dt.datetime(2024, 1, 5, 12, 0, 0)
    ev = _ev(spark, [
        (1, dt.datetime(2024, 1, 1), 7, "a", 1.0),
        (2, t, 7, "b", 2.0),
        (3, t, 7, "c", 3.0),   # same ts: higher event_id wins
    ])
    r = latest_transform(ev).collect()[0]
    assert r.event_id == 3 and r.event_type == "c"
    assert r.n_events == 3


# ------------------------------------------------------------------ dau/mau
def test_dau_wau_mau_windows(spark):
    from tokenkit_spark.ops.events import dau_wau_mau

    rows = []
    eid = 0
    # users 1..5 active day 1; user 9 active day 10 only
    for u in range(1, 6):
        rows.append((eid, dt.datetime(2024, 1, 1), u, "a", 1.0))
        eid += 1
    rows.append((eid, dt.datetime(2024, 1, 10), 9, "a", 1.0))
    out = {r.day: r for r in dau_wau_mau(_ev(spark, rows)).collect()}
    assert out["2024-01-01"].dau == 5
    # day 10: only user 9 that day; 7-day window excludes day 1
    assert out["2024-01-10"].dau == 1 and out["2024-01-10"].wau == 1
    # 30-day window still sees all 6
    assert out["2024-01-10"].mau == 6
    assert out["2024-01-10"].stickiness == pytest.approx(1 / 6, abs=1e-5)


# -------------------------------------------------------- score calibration
def test_score_calibration_split_behavior(spark):
    from tokenkit_spark.index.rankeval import score_calibration_audit

    docs = spark.createDataFrame(
        [(i, f"alpha w{i % 11}") for i in range(50)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "w3"), (1, "alpha")], "query_id long, text string"
    )
    out = {r.threshold: r for r in score_calibration_audit(
        docs, q, thresholds=(0.0, 1e9)
    ).collect()}
    # threshold 0: every top-k score clears it
    assert out[0.0].q_all_above == 2 and out[0.0].q_none_above == 0
    # absurd threshold: nothing clears
    assert out[1e9].q_none_above == 2
    assert out[1e9].mean_kept_frac == 0.0


# ----------------------------------------------------------- doc visibility
def test_doc_visibility_counts_queries(spark):
    from tokenkit_spark.index.rankeval import doc_visibility_audit

    docs = spark.createDataFrame(
        [(0, "alpha beta")] + [(i, f"alpha w{i}") for i in range(1, 20)]
        + [(99, "beta only")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], "query_id long, text string"
    )
    out = {r.doc_id: r for r in doc_visibility_audit(
        docs, q, k=10, top_n=30
    ).collect()}
    # doc 0 matches both queries
    assert out[0].n_queries == 2
    assert out[99].n_queries == 1


# -------------------------------------------------------- partition pruning
def test_partition_pruning_selectivity(spark):
    from tokenkit_spark.index.layout import partition_pruning_audit

    rows = []
    eid = 0
    for day in range(1, 31):
        for _ in range(10):
            rows.append((eid, dt.datetime(2024, 1, day), 1, "a", 1.0))
            eid += 1
    out = {r.range_name: r for r in partition_pruning_audit(
        _ev(spark, rows)
    ).collect()}
    assert out["one_day"].partitions_touched == 1
    assert out["one_day"].partitions_total == 30
    assert out["one_day"].row_selectivity == pytest.approx(1 / 30, abs=1e-4)
    assert out["one_week"].partitions_touched == 7
    assert out["full_month"].row_selectivity == 1.0
