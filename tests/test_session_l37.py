"""Session-L batch 37: feed discovery, rel mix, render dependence."""

import pytest
from pyspark.sql import functions as F


def test_feed_discovery(spark):
    from tokenkit_spark.ops.metadirectives import feed_discovery_audit

    pages = spark.createDataFrame(
        [
            ("h", '<link rel="alternate" '
                  'type="application/rss+xml" href="/feed">'),
            ("h", '<link rel="alternate" '
                  'type="application/atom+xml" href="/atom">'),
            ("h", "<p>no feed</p>"),
            ("h", "<p>none either</p>"),
        ],
        "host string, html string",
    )
    r = feed_discovery_audit(pages).collect()[0]
    assert r.n_rss == 1 and r.n_atom == 1 and r.n_json_feed == 0
    assert r.n_any == 2 and r.n_pages == 4


def test_link_rel_mix(spark):
    from tokenkit_spark.ops.outlinks import link_rel_mix

    pages = spark.createDataFrame(
        [
            ("h", '<a href="/a">x</a>'
                  '<a href="/b" rel="nofollow">y</a>'
                  '<a href="/c" rel="sponsored nofollow">z</a>'
                  '<a href="/d" rel="ugc">w</a>'),
        ],
        "host string, html string",
    )
    r = link_rel_mix(pages).collect()[0]
    assert r.n_anchors == 4
    # rel="sponsored nofollow": first listed token is sponsored; the
    # nofollow scan requires nofollow within the rel value
    assert r.n_nofollow == 2
    assert r.n_sponsored == 1 and r.n_ugc == 1
    assert r.n_plain == 1 and r.n_qualified == 3


def test_render_dependence(spark):
    from tokenkit_spark.ops.outlinks import link_rel_mix  # noqa: F401
    from tokenkit_spark.ops.metadirectives import (
        render_dependence_audit,
    )

    pages = spark.createDataFrame(
        [
            ("h", '<script src="app.js"></script>'
                  "<script>inline()</script>"
                  "<noscript>enable js</noscript>"
                  '<iframe src="/embed"></iframe>'),
            ("h", "<p>static page</p>"),
        ],
        "host string, html string",
    )
    r = render_dependence_audit(pages).collect()[0]
    assert r.n_script_ext == 1 and r.n_script_inline == 1
    assert r.n_noscript == 1 and r.n_iframe == 1
    assert r.n_scripts_total == 2 and r.n_pages == 2
