"""Session-L batch 28: mixed content, meta refresh, Lx engagement."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_mixed_content_https_only(spark):
    from tokenkit_spark.ops.webclean import mixed_content_audit

    pages = spark.createDataFrame(
        [
            ("h", "https", '<img src="http://cdn.x/a.png">'
                           '<script src="http://cdn.x/b.js"></script>'),
            ("h", "https", '<img src="https://cdn.x/c.png">'),
            # http page referencing http is NOT mixed content
            ("h", "http", '<img src="http://cdn.x/d.png">'),
            ("g", "https", "<p>no resources</p>"),
        ],
        "host string, scheme string, html string",
    )
    out = {r.host: r for r in mixed_content_audit(pages).collect()}
    h = out["h"]
    assert h.n_pages == 3 and h.n_https_pages == 2
    assert h.pages_mixed == 1 and h.n_mixed_refs == 2
    # mixed share pages_mixed/n_https_pages = 1/2
    assert h.pages_mixed * 2 == h.n_https_pages
    assert out["g"].pages_mixed == 0


def test_meta_refresh_classification(spark):
    from tokenkit_spark.ops.metadirectives import meta_refresh_audit

    pages = spark.createDataFrame(
        [
            ("h", '<meta http-equiv="refresh" content="0; url=/new">'),
            ("h", '<meta http-equiv="refresh" content="5; url=/ad">'),
            ("h", "<script>location.href = '/x';</script>"),
            ("h", "<script>location.replace('/y')</script>"),
            ("h", "<p>plain page</p>"),
        ],
        "host string, html string",
    )
    r = meta_refresh_audit(pages).collect()[0]
    assert r.n_pages == 5
    assert r.n_meta_refresh == 2
    assert r.n_instant == 1 and r.n_delayed == 1
    assert r.n_js_redirect == 2
    assert r.n_any_redirect == 4


def test_engagement_lx_histogram(spark):
    from tokenkit_spark.ops.events import engagement_lx

    rows = []
    # week of Mon 2024-01-01: user 1 active 7 days, user 2 active 2
    # days (one day twice — still 2 distinct), user 3 active 1 day
    for d in range(7):
        rows.append((dt.datetime(2024, 1, 1 + d, 9), 1, "a", 1.0))
    rows += [
        (dt.datetime(2024, 1, 2, 9), 2, "a", 1.0),
        (dt.datetime(2024, 1, 2, 10), 2, "b", 1.0),
        (dt.datetime(2024, 1, 4, 9), 2, "a", 1.0),
        (dt.datetime(2024, 1, 3, 9), 3, "a", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.week: r for r in engagement_lx(ev).collect()}
    w = out["2024-01-01"]
    assert w.n_users == 3
    assert w.l7 == 1 and w.l2 == 1 and w.l1 == 1
    assert w.l3 == 0
    assert w.sum_days == 7 + 2 + 1
