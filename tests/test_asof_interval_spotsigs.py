"""As-of join (ops/asof.py), bucketized interval join
(ops/intervaljoin.py), SpotSigs near-dup (ops/spotsigs.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops.asof import asof_join
from tokenkit_spark.ops.intervaljoin import interval_join
from tokenkit_spark.ops.spotsigs import spot_signatures, spotsigs_pairs

TS = "ts timestamp"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _left(spark, rows):
    return spark.createDataFrame(rows, f"event_id long, user_id long, {TS}")


def _right(spark, rows):
    return spark.createDataFrame(rows, f"user_id long, {TS}, value double")


# ------------------------------------------------------------ as-of join


def test_asof_latest_preceding_inclusive(spark):
    left = _left(
        spark,
        [
            (1, 7, _ts("2024-01-02T10:00:00")),
            (2, 7, _ts("2024-01-02T12:00:00")),
        ],
    )
    right = _right(
        spark,
        [
            (7, _ts("2024-01-02T09:00:00"), 1.0),
            (7, _ts("2024-01-02T10:00:00"), 2.0),  # tie: inclusive
            (7, _ts("2024-01-02T11:30:00"), 3.0),
        ],
    )
    out = {
        r.event_id: r
        for r in asof_join(left, right, value_col="value").collect()
    }
    assert out[1].asof_value == 2.0  # equal-ts right row matches
    assert out[2].asof_value == 3.0
    assert out[1].asof_lag_us == 0


def test_asof_no_match_is_null(spark):
    left = _left(spark, [(1, 7, _ts("2024-01-01T00:00:00"))])
    right = _right(spark, [(7, _ts("2024-01-02T00:00:00"), 1.0)])
    row = asof_join(left, right, value_col="value").collect()[0]
    assert row.asof_ts is None and row.asof_value is None
    assert row.asof_lag_us is None


def test_asof_keys_do_not_leak(spark):
    left = _left(spark, [(1, 7, _ts("2024-01-02T00:00:00"))])
    right = _right(spark, [(8, _ts("2024-01-01T00:00:00"), 9.0)])
    row = asof_join(left, right, value_col="value").collect()[0]
    assert row.asof_value is None


def test_asof_duplicate_right_ts_deduped_by_max(spark):
    left = _left(spark, [(1, 7, _ts("2024-01-02T00:00:00"))])
    right = _right(
        spark,
        [
            (7, _ts("2024-01-01T00:00:00"), 1.0),
            (7, _ts("2024-01-01T00:00:00"), 5.0),
        ],
    )
    row = asof_join(left, right, value_col="value").collect()[0]
    assert row.asof_value == 5.0


# -------------------------------------------------------- interval join


def _intervals(spark, rows):
    return spark.createDataFrame(
        rows, "incident_id long, start_us long, end_us long"
    )


def _events_us(spark, rows):
    return spark.createDataFrame(rows, "eid long, ts_us long")


def test_interval_join_half_open_bounds(spark):
    iv = _intervals(spark, [(0, 100, 200)])
    ev = _events_us(spark, [(1, 99), (2, 100), (3, 199), (4, 200)])
    out = interval_join(
        ev, iv, ts_col="ts_us", bucket_us=50
    ).select("eid").collect()
    assert sorted(r.eid for r in out) == [2, 3]  # start incl, end excl


def test_interval_join_overlapping_windows_fan_out(spark):
    iv = _intervals(spark, [(0, 0, 1000), (1, 400, 600)])
    ev = _events_us(spark, [(1, 500)])
    out = interval_join(ev, iv, ts_col="ts_us", bucket_us=100).collect()
    assert sorted(r.incident_id for r in out) == [0, 1]


def test_interval_join_bucket_width_invariant(spark):
    # The bucketized plan must be bucket-width independent.
    iv = _intervals(spark, [(0, 150, 450), (1, 300, 900), (2, 890, 891)])
    ev = _events_us(spark, [(i, i * 37) for i in range(30)])
    outs = []
    for b in (10, 100, 1000):
        rows = interval_join(ev, iv, ts_col="ts_us", bucket_us=b).collect()
        outs.append(sorted((r.eid, r.incident_id) for r in rows))
    assert outs[0] == outs[1] == outs[2] and outs[0]


# ------------------------------------------------------------- SpotSigs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spot_signatures_anchor_chains(spark):
    # "the quick brown fox": anchor 'the' -> chain quick:brown.
    # 'a lazy' at the end lacks 2 followers -> dropped.
    d = _docs(spark, [(1, "the quick brown fox saw a lazy")])
    sigs = {r.sig for r in spot_signatures(d).collect()}
    assert sigs == {"quick:brown"}


def test_spot_signatures_skip_stopwords_in_chain(spark):
    # chain skips the intervening anchors: 'the of quick a brown'
    # -> chain after first 'the' is quick:brown.
    d = _docs(spark, [(1, "the of quick a brown end")])
    sigs = {r.sig for r in spot_signatures(d).collect()}
    assert "quick:brown" in sigs


def test_spotsigs_detects_near_dup_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    d = _docs(
        spark,
        [
            (1, base),
            (2, base + " tail"),  # same signature set
            (3, "a completely different set of words here now"),
        ],
    )
    out = spotsigs_pairs(d, tau=0.5, k=10).collect()
    assert [(r.d1, r.d2) for r in out] == [(1, 2)]
    # doc1: {quick:brown, lazy:dog}; doc2 adds {again:tail} via the
    # final 'and' anchor (doc1's 'and again' lacks a 2nd follower).
    assert out[0].co_sigs == 2
    assert out[0].jaccard == pytest.approx(2 / 3, abs=1e-6)


def test_spotsigs_sig_df_cap(spark):
    # A signature shared by every doc is dropped above the cap.
    rows = [(i, "the same pair") for i in range(6)]
    assert spotsigs_pairs(_docs(spark, rows), tau=0.1, max_sig_df=3).count() == 0
    assert spotsigs_pairs(_docs(spark, rows), tau=0.1, max_sig_df=None).count() == 15
