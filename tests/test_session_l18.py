"""Session-L batch 18: Che LRU approximation, trend break, rowgroup
plan, Bloom FPR, Welch ANOVA, replica apportionment."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ---------------------------------------------------------------- che lru
def test_che_hit_ratio_monotone_in_size(spark):
    from tokenkit_spark.index.cache import che_lru_approximation

    rows = []
    # zipfy key popularity over 100 keys
    for i in range(2000):
        k = f"q{(i * i) % 100}"
        rows.append((1, i, k))
    qlog = spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )
    out = sorted(
        che_lru_approximation(qlog, cache_sizes=(2, 10, 60)).collect(),
        key=lambda r: r.cache_size,
    )
    hits = [r.predicted_hit_ratio for r in out]
    assert hits == sorted(hits)
    # never beats the infinite-cache hit ceiling
    for r in out:
        assert r.predicted_hit_ratio <= r.max_hit_ratio + 1e-6
    assert out[-1].t_char > out[0].t_char


# -------------------------------------------------------------- trend break
def test_trend_break_slope_change(spark):
    from tokenkit_spark.ops.changepoint import trend_break_fit

    rows = []
    for day in range(1, 31):
        # flat 10/day, then growing 10 + 4*(day-15)
        n = 10 if day <= 15 else 10 + 4 * (day - 15)
        for _ in range(n):
            rows.append((dt.datetime(2024, 1, day, 12, 0), 1, "a", 1.0))
    r = trend_break_fit(_ev(spark, rows)).collect()[0]
    assert abs(r.slope_before) < 0.5
    assert r.slope_after > 3.0
    assert r.slope_delta > 3.0


# ------------------------------------------------------------ rowgroup plan
def test_rowgroup_plan_arithmetic(spark):
    from tokenkit_spark.index.layout import rowgroup_plan

    docs = spark.createDataFrame(
        [(i, 1024 * 1024) for i in range(100)],  # 100 MB total
        "doc_id long, n_chars long",
    )
    out = {r.rowgroup_mb: r for r in rowgroup_plan(docs).collect()}
    assert out[8].n_rowgroups == 13  # ceil(100/8)
    assert out[512].n_rowgroups == 1
    # scan tasks never below total/maxPartition
    assert out[512].scan_tasks == 1
    assert out[8].lookup_read_mb == 4.0


# -------------------------------------------------------------- bloom fpr
def test_bloom_fpr_within_theory_ballpark(spark):
    from tokenkit_spark.ops.dedup import bloom_fpr_audit

    docs = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    r = bloom_fpr_audit(docs, m_bits=4096).collect()[0]
    assert r.n_members == 1000 and r.n_probes == 1000
    # k*n/m ~ 0.98 -> approx fpr ~ 0.15; measured within 2x
    assert 0.05 < r.measured_fpr < 0.4
    assert abs(r.measured_fpr - r.approx_fpr) < 0.1
    assert r.exact_fpr == pytest.approx(r.approx_fpr, abs=0.01)


# ------------------------------------------------------------- welch anova
def test_welch_anova_separated_groups(spark):
    rows = []
    for i in range(300):
        g = ["a", "b", "c"][i % 3]
        base = {"a": 10.0, "b": 50.0, "c": 90.0}[g]
        rows.append(
            (dt.datetime(2024, 1, 1), i, g, base + (i % 7) * (i % 3 + 1))
        )
    from tokenkit_spark.ops.aggs import welch_anova

    r = welch_anova(_ev(spark, rows)).collect()[0]
    assert r.k_groups == 3 and r.df1 == 2
    assert r.f_stat > 100  # wildly separated means
    assert r.df2 > 10


def test_welch_anova_identical_groups_small_f(spark):
    rows = []
    for i in range(300):
        g = ["a", "b", "c"][i % 3]
        rows.append((dt.datetime(2024, 1, 1), i, g, float((i // 3) % 20)))
    from tokenkit_spark.ops.aggs import welch_anova

    r = welch_anova(_ev(spark, rows)).collect()[0]
    assert r.f_stat < 1.0


# ------------------------------------------------------------ replica plan
def test_replica_apportionment_sums_and_proportionality(spark):
    from tokenkit_spark.index.routing import replica_apportionment

    rows = []
    # skewed query popularity
    for i in range(1000):
        q = "hot query" if i % 2 == 0 else f"cold {i % 20}"
        rows.append((1, i, q))
    qlog = spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )
    out = replica_apportionment(
        qlog, n_shards=8, total_replicas=16
    ).collect()
    # every present shard keeps its primary
    assert all(r.replicas >= 1 for r in out)
    # seats add up exactly: primaries + apportioned
    assert sum(r.replicas for r in out) == len(out) + (16 - 8)
    hot = max(out, key=lambda r: r.load)
    cold = min(out, key=lambda r: r.load)
    assert hot.replicas >= cold.replicas
