"""Session-L batch 15: quantile normalization, bot detection, query
cache normalization, term burstiness, perplexity sweep, skew audit."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ---------------------------------------------------------- quantile norm
def test_quantile_norm_aligns_shifted_source(spark):
    from tokenkit_spark.ops.harmonize import quantile_normalize_audit

    rows = [(i, float(i), "low") for i in range(50)] + [
        (100 + i, 1000.0 + i, "high") for i in range(50)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, n_chars double, source string"
    )
    out = {r.grp: r for r in quantile_normalize_audit(
        d, "n_chars"
    ).collect()}
    # both sources map onto the same pooled distribution: the 'high'
    # source's mean is pulled DOWN toward the pooled mean, 'low' UP
    assert out["high"].mean_mapped < out["high"].mean_raw
    assert out["low"].mean_mapped > out["low"].mean_raw
    assert out["high"].max_abs_shift > 100


# ----------------------------------------------------------- bot detection
def test_bot_detection_flags(spark):
    from tokenkit_spark.ops.traps import bot_detection

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # bot 1: 30 events in one minute, metronomic 1s gaps
    for i in range(30):
        rows.append((base + dt.timedelta(seconds=i), 1, "view", 1.0))
    # human 2: irregular, daytime, slow
    offs = [0, 70, 500, 1300, 1400, 5200, 9000]
    for o in offs:
        rows.append((base + dt.timedelta(seconds=o), 2, "view", 1.0))
    # night owl 3: all events at 03:00
    night0 = dt.datetime(2024, 1, 1, 3, 0, 0)
    for i in range(5):
        rows.append(
            (night0 + dt.timedelta(seconds=i * 40), 3, "view", 1.0)
        )
    out = {r.user_id: r for r in bot_detection(_ev(spark, rows)).collect()}
    assert out[1].high_rate and out[1].metronomic
    assert out[1].bot_score >= 2
    assert out[2].bot_score == 0
    assert out[3].nocturnal


# ------------------------------------------------------- query cache norm
def test_query_cache_normalization_merges_variants(spark):
    from tokenkit_spark.ops.searchlog import (
        query_cache_normalization_audit,
    )

    qlog = spark.createDataFrame(
        [
            (1, 1, "hash join"),
            (2, 1, "join hash"),
            (3, 1, "the hash join"),
            (4, 1, "window agg"),
        ],
        "session_id long, step long, query string",
    )
    r = query_cache_normalization_audit(qlog).collect()[0]
    assert r.n_requests == 4
    assert r.raw_keys == 4 and r.norm_keys == 2
    assert r.norm_hit_rate > r.raw_hit_rate
    # three raw variants collapse into one normalized key
    assert r.max_group == 3 and r.merged_groups == 1


# -------------------------------------------------------- term burstiness
def test_term_burstiness_clumped_vs_sprinkled(spark):
    from tokenkit_spark.ops.textstats import term_burstiness

    docs = []
    # 'clump' occurs 5x in each of 3 docs; 'sprinkle' 1x in 15 docs
    for i in range(15):
        txt = "sprinkle filler words"
        if i < 3:
            txt += " clump" * 5
        docs.append((i, txt))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.term: r for r in term_burstiness(d, k=10).collect()}
    assert out["clump"].burstiness == pytest.approx(5.0)
    assert out["sprinkle"].burstiness == pytest.approx(1.0)
    assert out["clump"].p_adapt == 1.0
    assert out["sprinkle"].p_adapt == 0.0
    assert out["clump"].rank < out["sprinkle"].rank


# --------------------------------------------------------------- ppl sweep
def test_ppl_sweep_monotone(spark):
    from tokenkit_spark.ops.textstats import perplexity_filter_sweep

    docs = spark.createDataFrame(
        [(i, f"common words here plus w{i % 9} extra") for i in range(40)],
        "doc_id long, text string",
    )
    out = sorted(
        perplexity_filter_sweep(
            docs, thresholds=(5.0, 50.0, 5000.0)
        ).collect(),
        key=lambda r: r.threshold,
    )
    kept = [r.n_kept for r in out]
    assert kept == sorted(kept)  # monotone in threshold
    assert out[-1].frac_kept == 1.0


# -------------------------------------------------------------- skew audit
def test_skew_audit_flags_hot_key(spark):
    from tokenkit_spark.ops.aggs import join_key_skew_audit

    rows = []
    base = dt.datetime(2024, 1, 1)
    # 'hot' event_type holds 90% of rows; user_id is uniform
    for i in range(1000):
        et = "hot" if i % 10 != 0 else f"cold{i % 100}"
        rows.append((base, i % 100, et, 1.0))
    out = {r.key: r for r in join_key_skew_audit(
        _ev(spark, rows), ["user_id", "event_type"]
    ).collect()}
    assert out["event_type"].top_share == pytest.approx(0.9)
    # a schedule on event_type cannot beat ~1.1x parallelism
    assert out["event_type"].parallel_ceiling < 2
    assert out["user_id"].top_share < 0.02
    assert out["user_id"].parallel_ceiling > 50
