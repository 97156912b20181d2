"""Session-L batch 36: activation latency, schema types, case
collisions."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_activation_latency(spark):
    from tokenkit_spark.ops.events import activation_latency

    rows = [
        # cohort 2024-01-01: u1 returns after 2 days, u2 never,
        # u3 returns next day
        (dt.datetime(2024, 1, 1, 9), 1, "a", 1.0),
        (dt.datetime(2024, 1, 3, 9), 1, "a", 1.0),
        (dt.datetime(2024, 1, 1, 10), 2, "a", 1.0),
        (dt.datetime(2024, 1, 1, 11), 3, "a", 1.0),
        (dt.datetime(2024, 1, 2, 11), 3, "a", 1.0),
        # second event same first day doesn't count as return
        (dt.datetime(2024, 1, 1, 23), 2, "b", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.cohort: r for r in activation_latency(ev).collect()}
    c = out["2024-01-01"]
    assert c.n_users == 3 and c.n_returned == 2
    assert c.frac_one_and_done == pytest.approx(1 / 3, abs=1e-6)
    assert c.median_gap_days == pytest.approx(1.5)


def test_schema_type_mix(spark):
    from tokenkit_spark.ops.htmlmeta import schema_type_mix

    pages = spark.createDataFrame(
        [
            ("h", '<script>{"@type": "Article"}</script>'),
            ("h", '<script>{"@type":"Product"}</script>'),
            ("h", '<script>{"@type": "Article", "x": 1}</script>'),
            ("h", "<p>untyped</p>"),
        ],
        "host string, html string",
    )
    r = schema_type_mix(pages).collect()[0]
    assert r.n_article == 2 and r.n_product == 1
    assert r.n_typed == 3 and r.n_pages == 4


def test_case_collision_audit(spark):
    from tokenkit_spark.ops.dust import case_collision_audit

    urls = spark.createDataFrame(
        [
            ("h", "/About"), ("h", "/about"), ("h", "/ABOUT"),
            ("h", "/contact"),
            ("g", "/x"), ("g", "/y"),
        ],
        "host string, path string",
    )
    out = {r.host: r for r in case_collision_audit(urls).collect()}
    h = out["h"]
    assert h.n_paths == 4 and h.n_folded == 2
    assert h.n_collision_groups == 1 and h.max_group == 3
    # redundant share (n_paths - n_folded)/n_paths = 2/4
    assert (h.n_paths - h.n_folded) * 2 == h.n_paths
    g = out["g"]
    assert g.n_collision_groups == 0 and g.n_paths == g.n_folded
