"""Rocchio and Bo1 PRF against hand-computed values on tiny corpora."""

import math

from tokenkit_spark.index.feedback import (
    bo1_expand,
    bo1_search,
    rocchio_expand,
    rocchio_search,
)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_rocchio_expand_hand_case(spark):
    docs = _mk(spark, [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "dog cat"),
    ], "doc_id long, text string")
    queries = _mk(spark, [(0, "apple")], "query_id long, text string")
    out = rocchio_expand(
        docs, queries, alpha=1.0, beta=0.75, fb_docs=1, fb_terms=10
    ).collect()
    w = {r.term: r.weight for r in out}
    # fb doc = doc 1 (only BM25 match). idf(t) = ln(1+(3-df+.5)/(df+.5))
    idf_a = math.log(1 + (3 - 1 + 0.5) / 1.5)
    idf_b = math.log(1 + (3 - 2 + 0.5) / 2.5)
    assert abs(w["apple"] - (1.0 + 0.75 * (2 / 3) * idf_a)) < 2e-6
    assert abs(w["banana"] - 0.75 * (1 / 3) * idf_b) < 2e-6
    assert "cherry" not in w and "dog" not in w


def test_rocchio_search_expansion_recalls_related_doc(spark):
    # doc 2 shares no ORIGINAL query term but shares "banana" with the
    # feedback doc -> Rocchio's second pass must retrieve it.
    docs = _mk(spark, [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "dog cat"),
    ], "doc_id long, text string")
    queries = _mk(spark, [(0, "apple")], "query_id long, text string")
    got = {r.doc_id for r in rocchio_search(
        docs, queries, fb_docs=1, fb_terms=10, k=10
    ).collect()}
    assert got == {1, 2}


def test_bo1_weights_hand_case(spark):
    docs = _mk(spark, [
        (1, "x y x"),
        (2, "y z"),
        (3, "w w"),
    ], "doc_id long, text string")
    queries = _mk(spark, [(0, "x")], "query_id long, text string")
    out = bo1_expand(
        docs, queries, fb_docs=1, fb_terms=10, rocchio_beta=0.4
    ).collect()
    w = {r.term: r.qtw for r in out}

    def bo1(tfx, cf, n=3):
        lam = cf / n
        return tfx * math.log2((1 + lam) / lam) + math.log2(1 + lam)

    # fb doc = doc 1; tfx: x=2, y=1. w(x)=bo1(2, cf=2), w(y)=bo1(1, cf=2)
    wx, wy = bo1(2, 2), bo1(1, 2)
    wmax = max(wx, wy)
    assert abs(w["x"] - (1.0 + 0.4 * wx / wmax)) < 2e-6
    assert abs(w["y"] - 0.4 * wy / wmax) < 2e-6
    assert "z" not in w and "w" not in w


def test_bo1_search_returns_pinned_ranks(spark):
    docs = _mk(spark, [
        (1, "x y x"), (2, "y z"), (3, "w w"),
    ], "doc_id long, text string")
    queries = _mk(spark, [(0, "x")], "query_id long, text string")
    rows = bo1_search(docs, queries, fb_docs=1, k=10).collect()
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
