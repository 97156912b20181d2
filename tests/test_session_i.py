"""Session-I operators: DFR PL2, Adamic-Adar, Matryoshka recall,
geo_line, variable_width_histogram, intervals_unordered."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- DFR PL2
def test_dfr_pl2_matches_closed_form(spark):
    from tokenkit_spark.index.lmsim import dfr_pl2

    docs = spark.createDataFrame(
        [
            (0, "spark spark merge sort"),
            (1, "spark join"),
            (2, "hash join hash join hash"),
            (3, "sort"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(0, "spark")], "query_id long, text string")
    rows = {r.doc_id: r.score for r in dfr_pl2(docs, queries, k=10).collect()}

    # closed form by hand: N=4, T=12, avgdl=3, cf(spark)=3
    def pl2(tf, dl):
        tfn = tf * math.log2(1 + (12 / 4) / dl)
        lam = 3 / 4
        s = (
            tfn * math.log2(tfn / lam)
            + (lam - tfn) * (1 / math.log(2))
            + 0.5 * math.log2(2 * math.pi * tfn)
        ) / (tfn + 1)
        return round(max(s, 0.0), 4)

    assert rows[0] == pl2(2, 4)
    assert rows[1] == pl2(1, 2)
    assert 2 not in rows and 3 not in rows  # no 'spark' occurrence


def test_dfr_pl2_clamps_nonnegative(spark):
    from tokenkit_spark.index.lmsim import dfr_pl2

    # a head term present in every doc earns a tiny / negative raw PL2;
    # the Lucene contract forces scores >= 0
    docs = spark.createDataFrame(
        [(i, "the " * 5 + f"w{i}") for i in range(6)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(0, "the")], "query_id long, text string")
    out = dfr_pl2(docs, queries, k=10).collect()
    assert all(r.score >= 0.0 for r in out)


# ------------------------------------------------------------ Adamic-Adar
def test_adamic_adar_hand_graph(spark):
    from tokenkit_spark.ops.linkgraph import adamic_adar

    # undirected star through z=0 (neighbors 1,2,3) plus edge 1-4:
    # deg(0)=3, deg(1)=2, deg(2)=1, deg(3)=1, deg(4)=1
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 4)], "src long, dst long"
    )
    out = {(r.src, r.dst): r.aa for r in adamic_adar(edges, k=20).collect()}
    w0 = 1 / math.log(3)  # pairs through z=0
    assert out[(1, 2)] == pytest.approx(round(w0, 6))
    assert out[(1, 3)] == pytest.approx(round(w0, 6))
    assert out[(2, 3)] == pytest.approx(round(w0, 6))
    # pairs through z=1 (deg 2): (0,4)
    assert out[(0, 4)] == pytest.approx(round(1 / math.log(2), 6))
    assert len(out) == 4


def test_adamic_adar_hub_cap_drops_wedges(spark):
    from tokenkit_spark.ops.linkgraph import adamic_adar

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )  # hub 0 with degree 5
    capped = adamic_adar(edges, k=100, max_degree=4).collect()
    assert capped == []  # only intermediate has deg 5 > cap
    exact = adamic_adar(edges, k=100, max_degree=None).collect()
    assert len(exact) == 10  # C(5,2) pairs through the hub


# ------------------------------------------------------ Matryoshka recall
def test_matryoshka_recall_full_dim_is_one(spark):
    from tokenkit_spark.ops.similarity import matryoshka_recall

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.dims: r.mean_recall
        for r in matryoshka_recall(
            emb, query_ids=[0, 1, 2], dims=[16, 4], k=5
        ).collect()
    }
    # truncating to the full width reproduces the reference ranking
    assert out[16] == 1.0
    # self always survives truncation -> recall at any d >= 1/k
    assert out[4] >= 1.0 / 5


# ----------------------------------------------------------------- geo_line
def test_geo_line_orders_truncates_and_flags(spark):
    from tokenkit_spark.ops.geo import geo_line

    rows = [("a", i, 10.0 + i, 20.0 + i) for i in range(12)] + [
        ("b", 0, 1.0, 2.0)
    ]
    df = spark.createDataFrame(
        rows, "g string, seq long, lat double, lon double"
    )
    out = {r.group: r for r in geo_line(df, "g", "lat", "lon", "seq", size=10).collect()}
    assert out["a"].n_points == 12 and out["a"].complete is False
    pts = out["a"].line.split(";")
    assert len(pts) == 10
    assert pts[0] == "2000:1000" and pts[9] == "2900:1900"  # first 10 by seq
    assert out["b"].complete is True and out["b"].line == "200:100"


# ------------------------------------------- variable_width_histogram
def test_vwh_splits_at_largest_gaps(spark):
    from tokenkit_spark.ops.aggs import variable_width_histogram

    # three obvious clusters: {1,2,3}, {50,51}, {100}
    vals = [1.0, 2.0, 3.0, 50.0, 51.0, 100.0, 2.0, 50.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = variable_width_histogram(df, "value", buckets=3).collect()
    assert [(r.min_v, r.max_v, r.doc_count) for r in out] == [
        (1.0, 3.0, 4),
        (50.0, 51.0, 3),
        (100.0, 100.0, 1),
    ]
    assert out[0].centroid == 2.0


def test_vwh_single_bucket_when_fewer_values(spark):
    from tokenkit_spark.ops.aggs import variable_width_histogram

    df = spark.createDataFrame([(5.0,), (5.0,)], "value double")
    out = variable_width_histogram(df, "value", buckets=4).collect()
    assert len(out) == 1 and out[0].doc_count == 2


# ---------------------------------------------------- intervals_unordered
def test_intervals_unordered_any_order(spark):
    from tokenkit_spark.index.spans import (
        intervals_ordered,
        intervals_unordered,
    )

    docs = spark.createDataFrame(
        [
            (0, "merge the sort"),      # reversed order, window 3 -> gaps 0
            (1, "the x sort y merge"),  # ordered, window 5 -> gaps 2
            (2, "the sort"),            # missing 'merge'
            (3, "merge a b c d e f g h the sort"),  # window 11 -> gaps 8
        ],
        "doc_id long, text string",
    )
    terms = ["the", "sort", "merge"]
    un = {r.doc_id: r.min_gaps for r in
          intervals_unordered(docs, terms, max_gaps=6).collect()}
    assert un == {0: 0, 1: 2}
    # the ordered variant rejects doc 0 (wrong order)
    od = {r.doc_id: r.min_gaps for r in
          intervals_ordered(docs, terms, max_gaps=6).collect()}
    assert 0 not in od and od[1] == 2


def test_intervals_unordered_requires_two_terms(spark):
    from tokenkit_spark.index.spans import intervals_unordered

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        intervals_unordered(docs, ["a"], max_gaps=1)
