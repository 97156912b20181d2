"""Phrase suggester: whole-pair LM ranking beats per-term df ranking."""

import tempfile

import pytest

from tokenkit_spark.config import AnalyzerConfig
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.phrasesuggest import phrase_suggest

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)


@pytest.fixture(scope="module")
def corpus(spark):
    # "hash join" is a frequent PAIR; "hush" is a frequent TERM that
    # never precedes "join" — pair-LM must pick hash over hush.
    rows = [(i, "hash join plan") for i in range(6)]
    rows += [(10 + i, "hush money hush tone hush hush") for i in range(8)]
    rows += [(30, "sort merge join"), (31, "hash table scan")]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("psidx") / "idx")
    build_index(spark, corpus, path, CFG, n_shards=2, n_buckets=4)
    return load_index(spark, path)


def test_pair_lm_beats_term_df(spark, corpus, index):
    qs = spark.createDataFrame([(0, "hsh join")], "query_id long, text string")
    got = sorted(
        phrase_suggest(spark, index, corpus, qs, CFG, n=3).collect(),
        key=lambda r: r.rank,
    )
    # 'hsh' is lev-1 from both 'hash' and 'hush'; 'hush' has higher df,
    # but the bigram 'hash join' dominates the pair score
    assert (got[0].w1, got[0].w2) == ("hash", "join")
    assert not got[0].is_original
    pairs = [(r.w1, r.w2) for r in got]
    assert ("hush", "join") in pairs
    assert pairs.index(("hash", "join")) < pairs.index(("hush", "join"))


def test_original_ranks_first_when_valid(spark, corpus, index):
    qs = spark.createDataFrame([(1, "sort merge")], "query_id long, text string")
    got = sorted(
        phrase_suggest(spark, index, corpus, qs, CFG, n=3).collect(),
        key=lambda r: r.rank,
    )
    assert got[0].is_original and (got[0].w1, got[0].w2) == ("sort", "merge")


def test_non_two_term_queries_dropped(spark, corpus, index):
    qs = spark.createDataFrame(
        [(0, "hash"), (1, "hash join plan"), (2, "")],
        "query_id long, text string",
    )
    assert phrase_suggest(spark, index, corpus, qs, CFG).count() == 0
