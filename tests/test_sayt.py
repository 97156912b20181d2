"""search-as-you-type (match_bool_prefix) and terms-lookup queries
(index/query.py round-3 additions).

Reference contracts: ES `match_bool_prefix` (last term = prefix query,
others = BM25 term clauses, bool SHOULD, constant-score prefix rewrite)
and the ES `terms` query with *terms lookup* (term list fetched from
another document, filter context).
"""

import math

import pytest

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index.query import (
    K1,
    B,
    bm25_brute,
    match_bool_prefix,
    terms_lookup_search,
)

WS = AnalyzerConfig(strategy="whitespace", lowercase=True)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "merge sort runs fast"),
        (1, "merge join beats hash join"),
        (2, "sorted scan"),
        (3, "hash aggregate"),
        (4, "merge merge merge"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_single_token_is_pure_prefix_constant_score(spark, docs):
    q = spark.createDataFrame([(0, "so")], "query_id long, text string")
    out = match_bool_prefix(docs, q, WS, k=10).collect()
    # "so" expands to {sort, sorted}: docs 0 and 2, constant score 1.0 each
    assert {(r.doc_id, r.score) for r in out} == {(0, 1.0), (2, 1.0)}


def test_exact_terms_score_bm25_and_prefix_adds_one(spark, docs):
    q = spark.createDataFrame([(0, "merge jo")], "query_id long, text string")
    out = {r.doc_id: r.score for r in match_bool_prefix(docs, q, WS, k=10).collect()}
    bm = {
        r.doc_id: r.score
        for r in bm25_brute(
            docs, spark.createDataFrame([(0, "merge")], "query_id long, text string"), WS
        ).collect()
    }
    # doc 1 matches the exact term AND the "jo"->join prefix: bm25 + 1.0
    assert math.isclose(out[1], bm[1] + 1.0, rel_tol=1e-9)
    # docs 0/4 match only the exact term
    assert math.isclose(out[0], bm[0], rel_tol=1e-9)
    assert math.isclose(out[4], bm[4], rel_tol=1e-9)
    # SHOULD semantics: a doc matching only the prefix still scores
    assert out.keys() == {0, 1, 4}


def test_max_expansions_caps_lexicographically(spark, docs):
    q = spark.createDataFrame([(0, "m")], "query_id long, text string")
    # vocab m-terms: merge (only one); with cap 1 behavior unchanged
    full = match_bool_prefix(docs, q, WS, k=10).collect()
    capped = match_bool_prefix(docs, q, WS, k=10, max_expansions=1).collect()
    assert {r.doc_id for r in full} == {r.doc_id for r in capped} == {0, 1, 4}
    # "s" expands to {scan, sort, sorted, ...}; cap 1 keeps only "scan"
    qs = spark.createDataFrame([(0, "s")], "query_id long, text string")
    capped = match_bool_prefix(docs, qs, WS, k=10, max_expansions=1).collect()
    assert {r.doc_id for r in capped} == {2}  # only docs with "scan"


def test_terms_lookup(spark, docs):
    out = terms_lookup_search(docs, lookup_doc_id=0, config=WS, k=10).collect()
    by = {r.doc_id: r.n_matched for r in out}
    # doc 0 terms: merge sort runs fast; doc 1 shares merge; doc 2 none
    # (sorted != sort under whitespace); doc 4 shares merge
    assert by == {1: 1, 4: 1}
    # lookup doc itself excluded
    assert 0 not in by
