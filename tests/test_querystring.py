"""query_string DSL tests: parser shapes + filter-context semantics."""

import pytest

from tokenkit_spark.index.querystring import parse_query_string


def test_parse_basic_clauses():
    p = parse_query_string('+scan -stream "hash join" merge')
    assert p.must == [("term", "scan")]
    assert p.must_not == [("term", "stream")]
    assert p.should == [("phrase", "hash join"), ("term", "merge")]


def test_parse_prefixed_phrase_and_edge_atoms():
    p = parse_query_string('-"sort merge" +fast')
    assert p.must_not == [("phrase", "sort merge")]
    assert p.must == [("term", "fast")]
    # bare +/- and empty quotes are dropped, empty string parses to nothing
    e = parse_query_string('+ - ""')
    assert e.must == e.must_not == e.should == []
    z = parse_query_string("")
    assert z.must == z.must_not == z.should == []


def test_query_string_semantics(spark):
    from tokenkit_spark.config import AnalyzerConfig
    from tokenkit_spark.index.build import build_index, load_index
    from tokenkit_spark.index.querystring import query_string_search
    import tempfile

    cfg = AnalyzerConfig(strategy="whitespace", lowercase=True)
    docs = spark.createDataFrame(
        [
            (0, "hash join beats sort merge"),
            (1, "join hash is not the phrase"),
            (2, "merge only here"),
            (3, "hash join but also stream"),
            (4, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        build_index(spark, docs, f"{d}/idx", config=cfg, n_shards=2)
        index = load_index(spark, f"{d}/idx")
        qs = spark.createDataFrame(
            [
                (0, '"hash join" merge -stream'),  # should-union minus
                (1, "+hash +merge"),               # conjunctive
                (2, "-hash"),                      # pure negation vs universe
                (3, '"sort merge" -"hash join"'),  # phrase vs phrase
            ],
            "query_id long, qtext string",
        )
        got = {}
        for r in query_string_search(spark, index, qs, cfg).collect():
            got.setdefault(r.query_id, set()).add(r.doc_id)
    # q0: phrase-matches {0,3} + merge {0,2} minus stream {3} -> {0,2}
    assert got[0] == {0, 2}
    # q1: hash {0,1,3} AND merge {0,2} -> {0}
    assert got[1] == {0}
    # q2: universe minus hash -> {2,4}
    assert got[2] == {2, 4}
    # q3: "sort merge" {0} minus "hash join" {0,3} -> empty
    assert 3 not in got


def test_clauseless_query_matches_nothing(spark):
    from tokenkit_spark.config import AnalyzerConfig
    from tokenkit_spark.index.build import build_index, load_index
    from tokenkit_spark.index.querystring import query_string_search
    import tempfile

    cfg = AnalyzerConfig(strategy="whitespace", lowercase=True)
    docs = spark.createDataFrame([(0, "some doc")], "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        build_index(spark, docs, f"{d}/idx", config=cfg, n_shards=1)
        index = load_index(spark, f"{d}/idx")
        qs = spark.createDataFrame(
            [(0, ""), (1, "   "), (2, "+ -")], "query_id long, qtext string"
        )
        # empty/bare-operator queries match NOTHING (not the universe)
        assert query_string_search(spark, index, qs, cfg).count() == 0
