"""Team-draft interleaving, co-click query similarity, click-graph
random walk (ops/clicks.py additions)."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops.clicks import (
    click_walk,
    coclick_query_similarity,
    tdi_outcome,
    team_draft_lists,
)


def _ranks(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rnk int")


# ----------------------------------------------------- team-draft merge


def test_tdi_draft_alternates_with_coin(spark):
    # query 1: coin at step 1 = (1+1)%2 = 0 -> A drafts first; then
    # counts force strict alternation when every pick succeeds.
    ra = _ranks(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    rb = _ranks(spark, [(1, 20, 1), (1, 21, 2), (1, 22, 3)])
    out = {
        r.step: (r.doc_id, r.team)
        for r in team_draft_lists(ra, rb, depth=4).collect()
    }
    assert out[1] == (10, "A")
    assert out[2] == (20, "B")
    # step 3 tie again: coin (1+3)%2 = 0 -> A
    assert out[3] == (11, "A")
    assert out[4] == (21, "B")


def test_tdi_shared_doc_consumed_once(spark):
    # Both rankers list doc 10 first: whoever drafts it removes it
    # from the other team's candidates.
    ra = _ranks(spark, [(0, 10, 1), (0, 11, 2)])
    rb = _ranks(spark, [(0, 10, 1), (0, 12, 2)])
    rows = team_draft_lists(ra, rb, depth=3).collect()
    ordered = sorted(rows, key=lambda r: r.step)
    # q=0: coin (0+1)%2=1 -> B drafts first and takes 10; A (fewer
    # picks) takes 11 (10 is consumed); step-3 tie coin -> B takes 12.
    assert [(r.doc_id, r.team) for r in ordered] == [
        (10, "B"),
        (11, "A"),
        (12, "B"),
    ]


def test_tdi_exhaustion_falls_back_to_other_team(spark):
    # A has a single doc; after it is drafted the remaining steps all
    # come from B even when the rule prefers A.
    ra = _ranks(spark, [(1, 10, 1)])
    rb = _ranks(spark, [(1, 20, 1), (1, 21, 2), (1, 22, 3)])
    rows = team_draft_lists(ra, rb, depth=4).collect()
    teams = [r.team for r in sorted(rows, key=lambda r: r.step)]
    assert teams.count("A") == 1 and teams.count("B") == 3


def test_tdi_outcome_prefers_better_ranker(spark):
    # Doc 10 is the only relevant doc; A ranks it 1st, B ranks it 3rd.
    # With patience 1, only step-1 clicks land: A gets all credit.
    ra = _ranks(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    rb = _ranks(spark, [(1, 12, 1), (1, 11, 2), (1, 10, 3)])
    il = team_draft_lists(ra, rb, depth=4)
    rel = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, doc_id long, rel int"
    )
    pat = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 4)],
        "query_id long, session_id long, patience int",
    )
    out = tdi_outcome(il, rel, pat).collect()[0]
    # step1 = A's doc 10 (coin (1+1)%2=0 -> A). session 0 (patience 1)
    # clicks it; session 1 (patience 4) also only clicks doc 10.
    assert out.trials == 2
    assert out.wins_a == 2 and out.wins_b == 0 and out.ties == 0
    assert out.pref_a == pytest.approx(1.0)


# ------------------------------------------------------------- co-click


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, session_id long, doc_id long, clicked int"
    )


def test_coclick_jaccard_hand_case(spark):
    # q1 clicks {1,2,3}; q2 clicks {2,3}; q3 clicks {9}.
    rows = (
        [(1, 0, d, 1) for d in (1, 2, 3)]
        + [(2, 0, d, 1) for d in (2, 3)]
        + [(3, 0, 9, 1), (1, 0, 9, 0)]
    )
    out = coclick_query_similarity(_log(spark, rows), k=5).collect()
    assert len(out) == 1
    top = out[0]
    assert (top.q1, top.q2, top.co_clicks) == (1, 2, 2)
    assert top.jaccard == pytest.approx(2 / 3, abs=1e-6)


def test_coclick_doc_df_cap_drops_mega_doc(spark):
    # Doc 99 clicked by every query: with the cap below its df the
    # pair disappears.
    rows = [(q, 0, 99, 1) for q in range(5)]
    assert (
        coclick_query_similarity(_log(spark, rows), max_doc_df=3).count()
        == 0
    )
    assert (
        coclick_query_similarity(_log(spark, rows), max_doc_df=None).count()
        == 10
    )


# ----------------------------------------------------------- click walk


def test_click_walk_reaches_indirect_docs(spark):
    # q1 -> d1 <- q2 -> d2: a 3-step walk from q1 must put mass on d2
    # (via d1 -> q2 -> d2) which q1 never clicked.
    rows = [(1, 0, 101, 1), (2, 0, 101, 1), (2, 0, 102, 1)]
    out = {
        (r.query_id, r.doc_id): r.prob
        for r in click_walk(_log(spark, rows), [1], steps=3).collect()
    }
    assert (1, 102) in out
    assert out[(1, 101)] > out[(1, 102)] > 0
    # Exact: q1->d1 (1.0). d1->q1 0.5, d1->q2 0.5. q1->d1 1.0;
    # q2->d1 .5, q2->d2 .5. P(d1) = .5*1 + .5*.5 = .75, P(d2) = .25.
    assert out[(1, 101)] == pytest.approx(0.75)
    assert out[(1, 102)] == pytest.approx(0.25)


def test_click_walk_mass_conserved(spark):
    rows = [
        (1, 0, 101, 1),
        (1, 0, 102, 1),
        (2, 0, 102, 1),
        (3, 0, 103, 1),
    ]
    out = click_walk(_log(spark, rows), [1, 3], steps=3, k=100).collect()
    for seed in (1, 3):
        total = sum(r.prob for r in out if r.query_id == seed)
        assert total == pytest.approx(1.0, abs=1e-6)
