"""Percolator tests: msm semantics, analysis, degenerate inputs."""

import pytest
from pyspark.sql import Row

from tokenkit_spark.config import AnalyzerConfig
from tokenkit_spark.index.percolate import analyze_stored_queries, percolate

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)


@pytest.fixture(scope="module")
def stored(spark):
    return spark.createDataFrame(
        [
            (0, "hash join", "all"),
            (1, "merge sort window", "2"),
            (2, "stream", "1"),
            (3, "", "all"),             # analyzes to nothing -> never matches
            (4, "hash hash join", "all"),  # dup terms collapse: required = 2
        ],
        "query_id long, qtext string, msm string",
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "hash join in the plan"),
            (1, "only hash here"),
            (2, "merge and sort but no win"),
            (3, "merge sort window complete"),
            (4, "a stream of events"),
            (5, "nothing at all"),
        ],
        "doc_id long, text string",
    )


def test_msm_semantics(spark, stored, docs):
    got = {}
    for r in percolate(spark, stored, docs, CFG).collect():
        got.setdefault(r.query_id, {})[r.doc_id] = r.n_matched
    assert set(got[0]) == {0}            # needs hash AND join
    assert got[0][0] == 2
    assert set(got[1]) == {2, 3}         # >= 2 of merge/sort/window
    assert got[1][3] == 3
    assert set(got[2]) == {4}            # disjunctive stream
    assert 3 not in got                  # empty query never matches


def test_duplicate_query_terms_collapse(spark, stored, docs):
    rows = analyze_stored_queries(stored, CFG).collect()
    q4 = [r for r in rows if r.query_id == 4]
    assert sorted(r.term for r in q4) == ["hash", "join"]
    assert all(r.required == 2 for r in q4)
    got = {r.doc_id for r in percolate(spark, stored, docs, CFG).collect()
           if r.query_id == 4}
    assert got == {0}


def test_msm_clamped_to_term_count(spark, docs):
    stored = spark.createDataFrame(
        [(9, "hash join", "5")], "query_id long, qtext string, msm string"
    )
    got = {r.doc_id for r in percolate(spark, stored, docs, CFG).collect()}
    assert got == {0}  # required clamps to 2, not an unsatisfiable 5


def test_int_typed_msm_column(spark, docs):
    """The docstring allows an int-typed msm column; it must behave
    exactly like its string twin (normalized via cast-to-string before
    the 'all' comparison — no implicit int-vs-string cast under ANSI)."""
    stored = spark.createDataFrame(
        [(9, "hash join", 2), (10, "merge sort window", 1)],
        "query_id long, qtext string, msm int",
    )
    got = {}
    for r in percolate(spark, stored, docs, CFG).collect():
        got.setdefault(r.query_id, set()).add(r.doc_id)
    assert got[9] == {0}
    assert got[10] == {2, 3}


def test_invalid_msm_raises(spark, docs):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    for bad in ("any", "0", ""):
        stored = spark.createDataFrame(
            [(0, "hash join", bad)], "query_id long, qtext string, msm string"
        )
        with pytest.raises(Exception, match="msm must be"):
            percolate(spark, stored, docs, CFG).collect()
