"""Session-L batch 17: log-rank, cannibalization, PRF drift,
Zipf-Mandelbrot, Adtributor, SPIMI plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ----------------------------------------------------------------- logrank
def test_logrank_detects_shorter_treatment_lifetimes(spark):
    from tokenkit_spark.ops.survival import logrank_test

    rows = []
    horizon_anchor = (dt.datetime(2024, 2, 20), 9999, "a", 1.0)
    for u in range(200):
        start = dt.datetime(2024, 1, 1)
        # odd users (arm 1) churn after 2 days, even after 12
        span = 2 if u % 2 else 12
        rows.append((start, u, "a", 1.0))
        rows.append((start + dt.timedelta(days=span - 1), u, "a", 1.0))
    rows.append(horizon_anchor)
    r = logrank_test(_ev(spark, rows)).collect()[0]
    assert r.significant
    # arm 1 dies earlier than expected under H0
    assert r.observed_1 > 0
    assert r.chi2 > 3.841


def test_logrank_identical_arms_not_significant(spark):
    from tokenkit_spark.ops.survival import logrank_test

    rows = []
    for u in range(100):
        start = dt.datetime(2024, 1, 1)
        span = 3 + (u // 2) % 5  # same distribution both arms
        rows.append((start, u, "a", 1.0))
        rows.append((start + dt.timedelta(days=span), u, "a", 1.0))
    rows.append((dt.datetime(2024, 2, 20), 9999, "a", 1.0))
    r = logrank_test(_ev(spark, rows)).collect()[0]
    assert not r.significant


# --------------------------------------------------------- cannibalization
def test_cannibalization_groups_host_pages(spark):
    from tokenkit_spark.index.dfs import keyword_cannibalization

    # host h0 = docs 0,10,20: all strong for 'target'
    rows = []
    for i in range(30):
        txt = "target match" if i % 10 == 0 else f"filler w{i}"
        rows.append((i, txt))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "target")], "query_id long, text string"
    )
    out = keyword_cannibalization(
        docs, q, F.concat(F.lit("h"), (F.col("doc_id") % 10)
                          .cast("string")),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.host == "h0" and r.n_pages == 3
    assert r.best_rank == 1 and r.rank_spread == 2


# --------------------------------------------------------------- prf drift
def test_prf_drift_flags_low_overlap(spark):
    from tokenkit_spark.index.feedback import prf_drift_audit

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 9} x{i % 4}") for i in range(60)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "alpha w3")], "query_id long, text string"
    )
    r = prf_drift_audit(docs, q).collect()[0]
    assert 0 <= r.topk_overlap <= 10
    assert r.drift_risk == (r.topk_overlap < 5)
    assert r.n_expansion_terms > 0


# ---------------------------------------------------------- zipf-mandelbrot
def test_zipf_mandelbrot_grid(spark):
    from tokenkit_spark.ops.textstats import zipf_mandelbrot_fit

    # zipfian corpus: term t_k appears ~ 1/k times
    rows = []
    did = 0
    words = []
    for k in range(1, 60):
        words += [f"t{k}"] * max(1, 200 // k)
    text = " ".join(words)
    docs = spark.createDataFrame(
        [(0, text)], "doc_id long, text string"
    )
    out = zipf_mandelbrot_fit(docs).collect()
    assert len(out) == 5
    best = [r for r in out if r.best]
    assert len(best) >= 1
    assert all(0 < r.s_exponent < 3 for r in out)
    assert max(r.r2 for r in out) > 0.9


# --------------------------------------------------------------- adtributor
def test_adtributor_finds_the_moving_segment(spark):
    from tokenkit_spark.ops.changepoint import adtributor

    rows = []
    pre, post = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 25)
    # stable segment
    for i in range(100):
        rows.append((pre, 1, "steady", 1.0))
        rows.append((post, 1, "steady", 1.0))
    # 'spiky' triples in the post period
    for i in range(50):
        rows.append((pre, 1, "spiky", 1.0))
    for i in range(150):
        rows.append((post, 1, "spiky", 1.0))
    out = {
        (r.dimension, r.value): r
        for r in adtributor(
            _ev(spark, rows), "2024-01-16 00:00:00",
            dimensions=("event_type",),
        ).collect()
    }
    spiky = out[("event_type", "spiky")]
    assert spiky.candidate
    # spiky explains the whole +100 delta
    assert spiky.ep == pytest.approx(1.0)
    assert spiky.surprise > out[("event_type", "steady")].surprise


# -------------------------------------------------------------------- spimi
def test_spimi_plan_counts(spark):
    from tokenkit_spark.index.capacity import spimi_build_plan

    docs = spark.createDataFrame(
        [(i, f"a b c w{i}") for i in range(10)],
        "doc_id long, text string",
    )
    r = spimi_build_plan(docs, buffer_mb=512.0).collect()[0]
    # 10 docs x 4 distinct terms = 40 postings, single block
    assert r.n_postings == 40
    assert r.n_blocks == 1 and r.merge_passes == 0
    assert r.total_io_passes == 1


def test_spimi_multi_block(spark):
    from tokenkit_spark.index.capacity import spimi_build_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(50))) for i in range(20)],
        "doc_id long, text string",
    )
    # tiny buffer: 1000 postings barely fit ~87 per block
    r = spimi_build_plan(docs, buffer_mb=0.001).collect()[0]
    assert r.n_blocks > 1
    assert r.merge_passes >= 1
