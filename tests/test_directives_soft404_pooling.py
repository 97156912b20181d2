"""Meta-robots/canonical extraction (ops/metadirectives.py), soft-404
signals (ops/soft404.py), embedding pooling (ops/pooling.py)."""

import math

from pyspark.sql import functions as F

from tokenkit_spark.ops.metadirectives import directive_rollup, page_directives
from tokenkit_spark.ops.pooling import mean_pool
from tokenkit_spark.ops.soft404 import soft404_signals


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, html string")


def test_page_directives_extraction(spark):
    rows = _pages(
        spark,
        [
            ("h", '<head><meta name="robots" content="noindex, nofollow">'
                  "</head>"),
            ("h", '<head><meta name="robots" content="noindex"></head>'),
            ("h", '<head><link rel="canonical" '
                  'href="https://other.example/x"></head>'),
            ("h", "<head></head>"),
        ],
    )
    out = page_directives(rows).collect()
    flags = [(r.noindex, r.nofollow, r.canonical) for r in out]
    assert (True, True, None) in flags
    assert (True, False, None) in flags
    assert (False, False, "https://other.example/x") in flags
    assert (False, False, None) in flags


def test_directive_rollup_counts(spark):
    rows = _pages(
        spark,
        [
            ("a.com", '<meta name="robots" content="noindex">'),
            ("a.com", '<link rel="canonical" href="https://a.com/c">'),
            ("a.com", '<link rel="canonical" href="https://b.com/c">'),
            ("a.com", "<p></p>"),
        ],
    )
    r = directive_rollup(rows).collect()[0]
    assert r.n_pages == 4 and r.n_noindex == 1
    assert r.n_canonical == 2 and r.n_cross_host_canonical == 1
    assert abs(r.frac_indexable - 0.75) < 1e-6


def test_noindex_not_matched_inside_words(spark):
    rows = _pages(
        spark, [("h", '<meta name="robots" content="nonoindexed">')]
    )
    r = page_directives(rows).collect()[0]
    assert not r.noindex


# -------------------------------------------------------------- soft404


def test_soft404_requires_phrase_and_template(spark):
    pages = spark.createDataFrame(
        [
            # templated error pages: same title on 3 pages + phrase
            ("h", "Not Found", "sorry, page not found"),
            ("h", "Not Found", "sorry, page not found"),
            ("h", "Not Found", "sorry, page not found"),
            # phrase but unique title: phrase-only signal
            ("h", "article 9", "this item does not exist anymore"),
            # clean page
            ("h", "article 1", "normal content here"),
        ],
        "host string, title string, text string",
    )
    r = soft404_signals(pages, dup_min=3).collect()[0]
    assert r.n_pages == 5
    assert r.n_phrase == 4
    assert r.n_templated == 3
    assert r.n_soft404 == 3
    assert abs(r.frac_soft404 - 0.6) < 1e-6


# -------------------------------------------------------------- pooling


def test_mean_pool_and_renormalize(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (4, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r.parent_id, r.pos): r.pooled
        for r in mean_pool(vecs, F.expr("vec_id DIV 4")).collect()
    }
    # parent 0: mean (0.5, 0.5) -> normalized (1/sqrt2, 1/sqrt2)
    assert abs(out[(0, 0)] - 1 / math.sqrt(2)) < 1e-6
    assert abs(out[(0, 1)] - 1 / math.sqrt(2)) < 1e-6
    # parent 1: single (3,4) -> (0.6, 0.8)
    assert abs(out[(1, 0)] - 0.6) < 1e-6
    assert abs(out[(1, 1)] - 0.8) < 1e-6


def test_mean_pool_zero_vector_passthrough(spark):
    vecs = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = {r.pos: r.pooled for r in mean_pool(vecs, F.col("vec_id")).collect()}
    assert out == {0: 0.0, 1: 0.0}
