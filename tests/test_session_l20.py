"""Session-L batch 20: hourly latency grid, holiday lift, content
gaps, domain diversity, chi-square independence, depth-quality."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ----------------------------------------------------------- hourly latency
def test_hourly_latency_peak(spark):
    from tokenkit_spark.ops.events import hourly_latency_grid

    rows = []
    for h in (9, 12, 18):
        lat = {9: 50.0, 12: 300.0, 18: 80.0}[h]
        for i in range(40):
            rows.append(
                (dt.datetime(2024, 1, 1, h, 0, i), 1, "a",
                 lat + i % 5)
            )
    out = {r.hour: r for r in hourly_latency_grid(_ev(spark, rows))
           .collect()}
    assert out[12].is_peak_p95
    assert not out[9].is_peak_p95
    assert out[9].p50 < out[12].p50


# ------------------------------------------------------------- holiday lift
def test_holiday_lift_ratio(spark):
    from tokenkit_spark.ops.events import holiday_lift

    rows = []
    # Jan 1 (holiday): 60 events; regular days: 20 each
    for _ in range(60):
        rows.append((dt.datetime(2024, 1, 1, 12), 1, "a", 1.0))
    for day in (2, 3, 4):
        for _ in range(20):
            rows.append((dt.datetime(2024, 1, day, 12), 1, "a", 1.0))
    r = holiday_lift(_ev(spark, rows)).collect()[0]
    assert r.n_holidays == 1 and r.n_regular_days == 3
    assert r.lift == pytest.approx(3.0)


# -------------------------------------------------------------- content gaps
def test_content_gap_classes(spark):
    from tokenkit_spark.index.dfs import content_gap_audit

    docs = spark.createDataFrame(
        [(i, "common topic " + ("niche " if i == 0 else "")
          + f"w{i}") for i in range(30)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "common"), (1, "niche"), (2, "absentterm")],
        "query_id long, text string",
    )
    out = {r.query_id: r for r in content_gap_audit(
        docs, q, min_results=5, min_top_score=10.0
    ).collect()}
    assert out[2].gap_class == "no_results" and out[2].n_results == 0
    assert out[1].gap_class == "thin_results"  # single doc
    # 'common' matches everything but idf ~ 0 -> weak top
    assert out[0].gap_class == "weak_top"


# --------------------------------------------------------- domain diversity
def test_domain_diversity_entropy(spark):
    from tokenkit_spark.index.dfs import domain_diversity_audit

    docs = spark.createDataFrame(
        [(i, "target page") for i in range(10)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "target")], "query_id long, text string"
    )
    # all docs same host
    r1 = domain_diversity_audit(
        docs, q, F.lit("onehost"), k=10
    ).collect()[0]
    assert r1.n_hosts == 1 and r1.top_host_share == 1.0
    assert r1.host_entropy == pytest.approx(0.0)
    # one host per doc: maximal entropy ln(10)
    r2 = domain_diversity_audit(
        docs, q, F.col("doc_id").cast("string"), k=10
    ).collect()[0]
    assert r2.n_hosts == 10
    assert r2.host_entropy == pytest.approx(math.log(10), abs=1e-4)


# --------------------------------------------------------- chi2 independence
def test_chi2_independence_detects_dependence(spark):
    from tokenkit_spark.ops.aggs import chi2_independence

    rows = []
    # type 'wk' only on weekdays 1-2, 'we' only on weekday 6
    for day in range(1, 29):
        wd = (day + 3) % 7 + 1  # matches the ISO derivation
        et = "we" if wd >= 6 else "wk"
        for _ in range(10):
            rows.append((dt.datetime(2024, 1, day, 10), 1, et, 1.0))
    r = chi2_independence(_ev(spark, rows)).collect()[0]
    assert r.significant and r.chi2 > r.chi2_crit
    assert r.df == (r.r_levels - 1) * (r.c_levels - 1)


def test_chi2_independence_independent_dims(spark):
    from tokenkit_spark.ops.aggs import chi2_independence

    rows = []
    for day in range(1, 29):
        for i in range(12):
            et = ["a", "b", "c"][i % 3]  # same mix every day
            rows.append((dt.datetime(2024, 1, day, 10), 1, et, 1.0))
    r = chi2_independence(_ev(spark, rows)).collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert not r.significant


# ------------------------------------------------------------ depth quality
def test_depth_quality_curve(spark):
    from tokenkit_spark.ops.traps import depth_quality_audit

    pages = spark.createDataFrame(
        [
            ("https://h.ex/p", 0.9),
            ("https://h.ex/a/p", 0.8),
            ("https://h.ex/a/b/p", 0.4),
            ("https://h.ex/a/b/p2", 0.6),
        ],
        "url string, quality double",
    )
    out = {r.depth: r for r in depth_quality_audit(pages).collect()}
    assert out[1].mean_quality == pytest.approx(0.9)
    assert out[3].mean_quality == pytest.approx(0.5)
    assert out[3].n_pages == 2
    # lift relative to corpus mean 0.675
    assert out[1].lift > 1 > out[3].lift
