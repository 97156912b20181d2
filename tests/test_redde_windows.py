"""ReDDE shard selection (index/redde.py), hopping windows and native
session windows (ops/events.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.index.redde import redde_shard_scores
from tokenkit_spark.ops.events import hopping_counts, native_session_stats


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- ReDDE


def test_redde_votes_scale_up_by_sample_rate(spark):
    # 40 docs; every sampled top doc votes n_s/s_s for its shard, and
    # est_rel sums to top_n * (per-shard scale factors) only over the
    # shards of the top docs.
    docs = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 == 0 else "gamma delta")
         for i in range(40)],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "alpha")], "query_id long, text string")
    out = redde_shard_scores(
        docs, qs, n_shards=4, sample_mod=2, top_n=5
    ).collect()
    assert out, "alpha must match sampled docs"
    # shares normalize to 1 per query
    assert sum(r.share for r in out) == pytest.approx(1.0, abs=1e-4)
    # with sample_mod=2 every scale factor n_s/s_s is ~2: total
    # estimated mass ~ top_n * 2
    assert sum(r.est_rel for r in out) == pytest.approx(10.0, rel=0.35)


def test_redde_unmatched_query_has_no_rows(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(8)], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(0, "zzz_nothing")], "query_id long, text string"
    )
    assert redde_shard_scores(docs, qs, n_shards=4, sample_mod=2).count() == 0


# -------------------------------------------------------- hopping window


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def test_hopping_event_lands_in_two_windows(spark):
    ev = _events(
        spark, [(1, _ts("2024-01-01T07:00:00"), 1, "click", 2.0)]
    )
    out = hopping_counts(ev, width="6 hours", slide="3 hours").collect()
    assert len(out) == 2
    starts = sorted(r.win_start_us for r in out)
    # 07:00 lands in [03:00,09:00) and [06:00,12:00)
    h = 3_600_000_000
    base = 1_704_067_200_000_000  # 2024-01-01T00:00Z
    assert starts == [base + 3 * h, base + 6 * h]
    assert all(r.win_end_us - r.win_start_us == 6 * h for r in out)
    assert all(r.n_events == 1 and r.sum_value == 2.0 for r in out)


def test_hopping_counts_sum_is_ratio_times_events(spark):
    rows = [
        (i, _ts("2024-01-01T00:00:00") + dt.timedelta(hours=i), 1,
         "click", 1.0)
        for i in range(10)
    ]
    out = hopping_counts(_events(spark, rows)).collect()
    assert sum(r.n_events for r in out) == 20  # each event in 2 windows


# -------------------------------------------------------- session window


def test_native_sessions_gap_merge_and_end_convention(spark):
    g = dt.timedelta(minutes=44)
    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        (1, t0, 7, "view", 1.0),
        (2, t0 + g, 7, "view", 2.0),          # within 45min -> merges
        (3, t0 + g + dt.timedelta(minutes=46), 7, "view", 3.0),  # new
    ]
    out = native_session_stats(_events(spark, rows), gap="45 minutes")
    rows_out = out.collect()
    assert [r.n_events for r in rows_out] == [2, 1]
    first = rows_out[0]
    # end = last event + gap
    assert first.session_end_us - first.session_start_us == (
        44 * 60 + 45 * 60
    ) * 1_000_000
    assert first.sum_value == pytest.approx(3.0)


def test_native_sessions_exact_gap_merges(spark):
    # Spark's session window is end-INCLUSIVE at the gap boundary: an
    # event exactly gap after the previous one merges (the oracle's
    # break condition is therefore strictly >).
    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        (1, t0, 7, "view", 1.0),
        (2, t0 + dt.timedelta(minutes=45), 7, "view", 1.0),
        (3, t0 + dt.timedelta(minutes=90, seconds=1), 7, "view", 1.0),
    ]
    out = native_session_stats(_events(spark, rows), gap="45 minutes")
    assert [r.n_events for r in out.collect()] == [2, 1]
