"""Session-L batch 33: title-body coverage, OBF monitor, subdomains."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_title_body_coverage(spark):
    from tokenkit_spark.ops.htmlmeta import title_body_coverage

    pages = spark.createDataFrame(
        [
            ("h", "spark guide", "a practical spark guide for all"),
            ("h", "cats", "dogs only here"),
            ("h", "big data", "big systems process data daily"),
        ],
        "host string, title string, body string",
    )
    r = title_body_coverage(pages).collect()[0]
    assert r.n_pages == 3
    assert r.n_full_coverage == 2 and r.n_zero_coverage == 1
    assert r.n_with_title == 3
    # coverage ppm: 1.0, 0.0, 1.0 -> sum 2_000_000
    assert r.sum_cov_ppm == 2_000_000


def test_obf_monitor_no_early_stop_on_null_effect(spark):
    from tokenkit_spark.ops.abtest import obrien_fleming_monitor

    rows = []
    # three weeks, arms identical in distribution -> |z| small
    for w in range(3):
        for u in range(200):
            rows.append(
                (dt.datetime(2024, 1, 1 + 7 * w, 9), u, "a",
                 10.0 + (u % 7))
            )
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.look: r for r in obrien_fleming_monitor(ev).collect()}
    assert len(out) == 3
    # boundaries decrease across looks
    assert out[1].bound > out[2].bound > out[3].bound
    assert not any(r.crossed for r in out.values())
    assert out[1].n0 == 100 and out[1].n1 == 100


def test_obf_monitor_huge_effect_crosses_early(spark):
    from tokenkit_spark.ops.abtest import obrien_fleming_monitor

    rows = []
    for w in range(3):
        for u in range(100):
            val = 100.0 + (u % 5) if u % 2 == 1 else 10.0 + (u % 5)
            rows.append(
                (dt.datetime(2024, 3, 4 + 7 * w, 9), u, "a", val)
            )
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.look: r for r in obrien_fleming_monitor(ev).collect()}
    assert out[1].crossed  # massive effect clears even 3.471


def test_subdomain_profile_sprawl(spark):
    from tokenkit_spark.ops.domains import subdomain_profile

    urls = spark.createDataFrame(
        [
            ("www.good.com",), ("www.good.com",), ("good.com",),
            ("a1.spam.net",), ("a2.spam.net",), ("a3.spam.net",),
            ("a4.spam.net",),
        ],
        "host string",
    )
    out = {r.domain: r for r in subdomain_profile(urls).collect()}
    g = out["good.com"]
    assert g.n_hosts == 2
    assert g.n_www_urls == 2 and g.n_apex_urls == 1
    assert g.n_urls == 3
    s = out["spam.net"]
    assert s.n_hosts == 4 and s.n_www_urls == 0
    assert s.max_host_urls == 1 and s.n_urls == 4
