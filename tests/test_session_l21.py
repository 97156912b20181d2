"""Session-L batch 21: log-normal fit, head coverage, link locality."""

import math

import pytest
from pyspark.sql import functions as F


def test_lognormal_fit_recovers_parameters(spark):
    from tokenkit_spark.ops.textstats import lognormal_length_fit

    # lengths = exp(N-ish grid around mu=6, sigma~0.5): use exact
    # quantile-like spread
    rows = []
    for i in range(200):
        z = (i - 99.5) / 57.7  # roughly [-1.72, 1.72], mean 0, sd ~1
        rows.append((i, int(math.exp(6.0 + 0.5 * z)), "s"))
    docs = spark.createDataFrame(
        rows, "doc_id long, n_chars long, source string"
    )
    r = lognormal_length_fit(docs).collect()[0]
    assert r.mu_log == pytest.approx(6.0, abs=0.05)
    assert r.sigma_log == pytest.approx(0.5, abs=0.1)
    # symmetric logs: implied and empirical medians agree
    assert r.median_ratio == pytest.approx(1.0, abs=0.05)


def test_head_coverage_monotone(spark):
    from tokenkit_spark.ops.searchlog import query_head_coverage

    rows = []
    # one dominant query (60%), tail of 40 rare ones
    for i in range(600):
        rows.append((1, i, "dominant"))
    for i in range(400):
        rows.append((1, 1000 + i, f"tail{i % 40}"))
    qlog = spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )
    out = {r.k: r for r in query_head_coverage(qlog).collect()}
    assert out[1].coverage == pytest.approx(0.6)
    assert out[10].coverage > out[1].coverage
    assert out[100].coverage == 1.0
    assert out[1].n_distinct == 41


def test_link_locality_shares(spark):
    from tokenkit_spark.ops.linkgraph import host_link_locality

    edges = spark.createDataFrame(
        [(0, 10), (0, 20), (0, 1), (5, 15), (5, 6)],
        "src long, dst long",
    )
    out = {r.host: r for r in host_link_locality(
        edges, lambda c: F.concat(F.lit("h"), (c % 10).cast("string"))
    ).collect()}
    # host h0: links to 10, 20 (internal mod-10), 1 (external)
    assert out["h0"].n_internal == 2 and out["h0"].n_external == 1
    assert out["h0"].locality == pytest.approx(2 / 3, abs=1e-5)
    assert out["h5"].n_internal == 1
