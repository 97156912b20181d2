"""Sequential Dependence Model (Metzler & Croft SIGIR 2005) on a
hand-checkable corpus: verify ordered-/unordered-window counting and
the Dirichlet feature mix against direct arithmetic."""

import math

from tokenkit_spark.index.sdm import sdm_search


def _mk(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_sdm_window_counts_and_score(spark):
    docs = _mk(spark, [
        (1, "big data big data systems"),
        (2, "data big pipelines and big rigs"),
        (3, "unrelated words entirely here"),
    ])
    queries = _mk(spark, [(0, "big data")],
                  "query_id long, text string")
    mu = 10.0
    out = sdm_search(docs, queries, mu=mu, k=10).collect()
    got = {r.doc_id: r.score for r in out}

    # collection stats: total tokens = 5 + 6 + 4 = 15
    T = 15.0
    cf = {"big": 4, "data": 3}
    # ordered "big data": doc1 has 2 (pos 0-1, 2-3); doc2 has 0 -> ocf=2
    # unordered window 8: doc1 pairs (0,1),(0,3),(2,1)?? count pairs of
    # (big,data) positions with |p1-p2|<8, p1!=p2:
    #   doc1 big@{0,2}, data@{1,3} -> 4 pairs; doc2 big@{1,4}, data@{0}
    #   -> 2 pairs; ucf = 6
    def f(tf, cfx, dl):
        return math.log((tf + mu * cfx / T) / (dl + mu))

    s1 = 0.85 * (f(2, cf["big"], 5) + f(2, cf["data"], 5)) \
        + 0.10 * f(2, 2, 5) + 0.05 * f(4, 6, 5)
    s2 = 0.85 * (f(2, cf["big"], 6) + f(1, cf["data"], 6)) \
        + 0.10 * f(0, 2, 6) + 0.05 * f(2, 6, 6)
    assert abs(got[1] - round(s1, 4)) < 2e-4
    assert abs(got[2] - round(s2, 4)) < 2e-4
    assert 3 not in got  # no query term -> not a candidate
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks[1] == 1 and ranks[2] == 2


def test_sdm_oov_and_self_pair(spark):
    # OOV unigram dropped; never-co-occurring pair dropped; self-pair
    # "run run" counted once per unordered position pair (p1 < p2).
    docs = _mk(spark, [(1, "run fast run"), (2, "walk slow")])
    queries = _mk(spark, [(0, "run run zzz")],
                  "query_id long, text string")
    out = sdm_search(docs, queries, mu=10.0, k=10).collect()
    got = {r.doc_id: r.score for r in out}
    assert 1 in got and 2 not in got
    T, mu = 5.0, 10.0

    def f(tf, cfx, dl):
        return math.log((tf + mu * cfx / T) / (dl + mu))

    # unigram "run" twice (duplicates kept), cf=2; ordered pair
    # (run,run) never adjacent anywhere -> ocf=0 -> dropped feature;
    # unordered self-pair: positions {0,2}, one pair (0,2) -> utf=1.
    s1 = 0.85 * (2 * f(2, 2, 3)) + 0.05 * f(1, 1, 3)
    assert abs(got[1] - round(s1, 4)) < 2e-4
