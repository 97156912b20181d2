"""Span-query family (index/spans.py), terms_set, geo operators, and the
join-field rollup: each checked against an independent pure-Python brute
formulation or pinned known-good values."""

import math

import pytest
from pyspark.sql import functions as F

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.spans import (
    _min_cover_window,
    match_phrase_prefix,
    span_first,
    span_near,
)
from tokenkit_spark.index.query import terms_set_search
from tokenkit_spark.ops import geo
from tokenkit_spark.sources.pages import pages_to_docs, synth_pages

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)


@pytest.fixture(scope="module")
def docs(spark):
    return pages_to_docs(synth_pages(spark, n_docs=300, seed=7)).cache()


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spanidx") / "index")
    build_index(spark, docs, path, CFG, n_shards=4, n_buckets=8)
    return load_index(spark, path)


@pytest.fixture(scope="module")
def texts(docs):
    return {r.doc_id: r.text.lower().split() for r in docs.collect()}


def test_min_cover_window_matches_exhaustive():
    import itertools
    import numpy as np
    import random

    rng = random.Random(3)
    for _ in range(200):
        k = rng.randint(1, 4)
        lists = [
            np.array(sorted(rng.sample(range(30), rng.randint(1, 5))))
            for _ in range(k)
        ]
        got = _min_cover_window(lists)
        best = min(
            max(c) - min(c) for c in itertools.product(*[l.tolist() for l in lists])
        )
        assert got == best


def test_span_near_unordered_vs_brute(spark, index, texts):
    CLAUSES = [
        (0, "data search"),
        (1, "engine crawl"),
        (2, "spark index shard"),
        (3, "zzz-neverfound data"),
    ]
    slop = 2
    got = {
        (r.query_id, r.doc_id): r.span
        for r in span_near(
            spark,
            index,
            spark.createDataFrame(CLAUSES, "query_id long, text string"),
            CFG,
            slop=slop,
        ).collect()
    }
    want = {}
    for qid, text in CLAUSES:
        terms = text.split()
        for d, toks in texts.items():
            # exhaustive: min over cartesian product of term positions
            pos = [[i for i, x in enumerate(toks) if x == t] for t in terms]
            if any(not p for p in pos):
                continue
            import itertools

            span = min(max(c) - min(c) for c in itertools.product(*pos))
            if span <= (len(terms) - 1) + slop:
                want[(qid, d)] = span
    assert got == want


def test_span_near_rejects_duplicate_terms(spark, index):
    with pytest.raises(ValueError, match="distinct"):
        span_near(
            spark,
            index,
            spark.createDataFrame([(0, "data data")], "query_id long, text string"),
            CFG,
        )


def test_span_first_vs_brute(spark, index, texts):
    QS = [(0, "data"), (1, "crawl"), (2, "zzz-neverfound")]
    end = 6
    got = {
        (r.query_id, r.doc_id): r.first_pos
        for r in span_first(
            spark,
            index,
            spark.createDataFrame(QS, "query_id long, text string"),
            CFG,
            end=end,
        ).collect()
    }
    want = {}
    for qid, term in QS:
        for d, toks in texts.items():
            firsts = [i for i, x in enumerate(toks) if x == term]
            if firsts and firsts[0] + 1 <= end:
                want[(qid, d)] = firsts[0]
    assert got == want


def test_span_first_rejects_multiterm(spark, index):
    with pytest.raises(ValueError, match="single"):
        span_first(
            spark,
            index,
            spark.createDataFrame([(0, "data search")], "query_id long, text string"),
            CFG,
        )


def test_match_phrase_prefix_vs_brute(spark, index, texts):
    PHR = [(0, "data se"), (1, "search eng"), (2, "zzz no")]
    got = {
        (r.query_id, r.doc_id): r.n_expansions_matched
        for r in match_phrase_prefix(
            spark,
            index,
            spark.createDataFrame(PHR, "query_id long, text string"),
            CFG,
            max_expansions=50,
        ).collect()
    }
    want = {}
    for qid, text in PHR:
        parts = text.split()
        lead, pfx = parts[:-1], parts[-1]
        for d, toks in texts.items():
            matched = set()
            for i in range(len(toks) - len(lead)):
                if toks[i : i + len(lead)] == lead and toks[i + len(lead)].startswith(
                    pfx
                ):
                    matched.add(toks[i + len(lead)])
            if matched:
                want[(qid, d)] = len(matched)
    assert got == want


def test_terms_set_vs_brute(spark, docs, texts):
    terms = ["data", "search", "crawl"]
    got = {
        r.doc_id: (r.n_matched, r.required)
        # pmod: synth doc_ids are signed hashes and Spark's % keeps the
        # dividend sign (Java remainder) unlike Python's floored %
        for r in terms_set_search(
            docs, terms, (F.pmod(F.col("doc_id"), F.lit(2)) + 1), CFG
        ).collect()
    }
    want = {}
    for d, toks in texts.items():
        n = len(set(terms) & set(toks))
        req = d % 2 + 1
        if n >= req:
            want[d] = (n, req)
    assert got == want


def test_geotile_known_osm_example(spark):
    # the OSM wiki slippy-map reference point: zoom 17,
    # (51.51202, 0.02435) -> tile x=65544, y=43582
    df = spark.createDataFrame([(51.51202, 0.02435)], "lat double, lon double")
    row = df.select(
        geo.geotile_key(F.col("lat"), F.col("lon"), 17).alias("tile")
    ).first()
    assert row.tile == "17/65544/43582"


def test_geotile_equator_origin(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    row = df.select(geo.geotile_key(F.col("lat"), F.col("lon"), 1).alias("t")).first()
    assert row.t == "1/1/1"


def test_haversine_london_paris(spark):
    df = spark.createDataFrame([(51.5074, -0.1278)], "lat double, lon double")
    row = df.select(
        geo.haversine_km(F.col("lat"), F.col("lon"), 48.8566, 2.3522).alias("km")
    ).first()
    assert abs(row.km - 343.5) < 1.5


def test_geo_distance_filter_and_bounds(spark):
    pts = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, 51.5074, -0.1278), (3, 40.7128, -74.006)],
        "id long, lat double, lon double",
    )
    near = geo.geo_distance(pts, 48.8566, 2.3522, 500.0)
    assert {r.id for r in near.collect()} == {1, 2}
    b = geo.geo_bounds(pts.withColumn("g", F.lit("all")), "g").first()
    assert b.top == 51.5074 and b.bottom == 40.7128
    assert b.left == -74.006 and b.right == 2.3522


def test_has_child_rollup(spark):
    from tokenkit_spark.ops.aggs import has_child

    parents = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "doc_id long, src string"
    )
    children = spark.createDataFrame(
        [(0, 1.0), (0, 5.0), (0, 2.0), (1, 9.0), (2, 1.0), (2, 2.0)],
        "pid long, value double",
    )
    got = {
        r.doc_id: (r.n_children, r.max_child_value)
        for r in has_child(parents, children, "doc_id", "pid", "value", 2).collect()
    }
    assert got == {0: (3, 5.0), 2: (2, 2.0)}


def test_multi_terms_order(spark):
    from tokenkit_spark.ops.aggs import multi_terms

    df = spark.createDataFrame(
        [("en", "a")] * 3 + [("en", "b")] * 3 + [("fr", "a")] * 1,
        "lang string, src string",
    )
    rows = multi_terms(df, ["lang", "src"], size=2).collect()
    assert [(r.lang, r.src, r.doc_count) for r in rows] == [
        ("en", "a", 3),
        ("en", "b", 3),
    ]
