"""Session-L batch 34: dedup state sizing, facet explosion, alt text."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_dedup_state_sizing_grows_with_ttl(spark):
    from tokenkit_spark.streaming.stats import dedup_state_sizing

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # 48 hours; each hour 10 users (u = hour*10..hour*10+9): every
    # 1h window has 10 keys, 6h windows 60, 24h windows 240
    for h in range(48):
        for i in range(10):
            rows.append(
                (base + dt.timedelta(hours=h, minutes=i), h * 10 + i,
                 "a", 1.0)
            )
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.ttl_s: r for r in dedup_state_sizing(ev).collect()}
    assert out[3600].max_keys == 10
    assert out[21600].max_keys == 60
    assert out[86400].max_keys == 240
    assert out[86400].est_mb_max == pytest.approx(
        240 * 64 / 1048576, abs=1e-6
    )
    assert out[3600].n_windows == 48


def test_facet_explosion_flags_session_ids(spark):
    from tokenkit_spark.ops.dust import facet_explosion_audit

    rows = []
    for i in range(20):
        rows.append(("h", f"/p?color={'red' if i % 2 else 'blue'}"
                          f"&sid=s{i}"))
    rows.append(("h", "/plain"))
    urls = spark.createDataFrame(rows, "host string, url string")
    out = {r.param: r for r in facet_explosion_audit(urls).collect()}
    sid = out["sid"]
    assert sid.n_urls == 20 and sid.n_values == 20
    assert sid.explosive
    color = out["color"]
    assert color.n_values == 2 and not color.explosive
    assert color.value_ratio == pytest.approx(0.1)


def test_alt_text_coverage(spark):
    from tokenkit_spark.ops.htmlmeta import alt_text_audit

    pages = spark.createDataFrame(
        [
            ("h", '<img src="a.png" alt="x"><img src="b.png">'),
            ("h", '<img src="c.png" alt="y">'),
            ("h", "<p>no images</p>"),
        ],
        "host string, html string",
    )
    r = alt_text_audit(pages).collect()[0]
    assert r.n_img == 3 and r.n_img_alt == 2
    assert r.n_pages_incomplete == 1
