"""ES boosting query demotion + intervals ordered/max_gaps semantics."""

import pytest

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.query import bm25_segments, boosting_search
from tokenkit_spark.index.spans import intervals_ordered

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (0, "apple pie recipe"),
            (1, "apple computer laptop"),
            (2, "apple orchard farm"),
            (3, "banana bread recipe"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path_factory.mktemp("bidx") / "index")
    build_index(spark, docs, path, CFG, n_shards=2, n_buckets=4)
    return load_index(spark, path)


def test_boosting_demotes_but_keeps(spark, index):
    q = spark.createDataFrame([(0, "apple")], "query_id long, text string")
    neg = spark.createDataFrame([(0, "computer")], "query_id long, text string")
    plain = {
        r.doc_id: r.score
        for r in bm25_segments(spark, index, q, CFG, k=10).collect()
    }
    boosted = {
        r.doc_id: r.score
        for r in boosting_search(spark, index, q, neg, k=10,
                                 negative_boost=0.5, config=CFG).collect()
    }
    # all three apple docs still match (negative side is not a filter)
    assert set(boosted) == {0, 1, 2}
    # doc 1 (matches 'computer') scores exactly half its plain score
    assert abs(boosted[1] - 0.5 * plain[1]) < 1e-9
    assert abs(boosted[0] - plain[0]) < 1e-9


def test_intervals_gaps_not_slop(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c"),        # gaps 0
            (1, "a x b c"),      # window 4, k 3 -> gaps 1
            (2, "b a c"),        # wrong order -> no match
            (3, "a x x x b c"),  # gaps 3
            (4, "a b"),          # missing c -> no match
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.min_gaps for r in
           intervals_ordered(docs, ["a", "b", "c"], max_gaps=1).collect()}
    assert out == {0: 0, 1: 1}
    wide = {r.doc_id: r.min_gaps for r in
            intervals_ordered(docs, ["a", "b", "c"], max_gaps=10).collect()}
    assert wide == {0: 0, 1: 1, 3: 3}


def test_intervals_repeated_occurrences_take_min(spark):
    # a ... b far apart, then a b adjacent later: min window wins
    docs = spark.createDataFrame(
        [(0, "a x x x b a b")], "doc_id long, text string"
    )
    out = intervals_ordered(docs, ["a", "b"], max_gaps=0).collect()
    assert len(out) == 1 and out[0].min_gaps == 0


def test_tiered_merge_plan_groups_and_leftovers(spark):
    from tokenkit_spark.index.merge import tiered_merge_plan

    # 12 tiny segments (tier 0) + 3 big ones (tier 1): only ONE full
    # group of 10 tiny segments is selected; 2 tiny + 3 big wait
    segs = spark.createDataFrame(
        [(i, 500 + i) for i in range(12)] + [(100 + i, 20_000) for i in range(3)],
        "segment_id int, size_docs int",
    )
    plan = tiered_merge_plan(segs, merge_factor=10, floor_docs=1000).collect()
    assert len(plan) == 10
    assert all(r.tier == 0 for r in plan)
    # smallest-first: segments 0..9 selected, 10 and 11 left waiting
    assert sorted(r.segment_id for r in plan) == list(range(10))
    assert all(r.group_docs == sum(500 + i for i in range(10)) for r in plan)
