"""Winnowing fingerprints (ops/dedup.py) and Stupid Backoff LM
(ops/textstats.py) against hand-computed references."""

import hashlib
import math

import pytest

from tokenkit_spark.ops.dedup import winnow_fingerprints, winnow_near_dups
from tokenkit_spark.ops.textstats import stupid_backoff_scores


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _ref_winnow(text: str, k: int, w: int) -> list[int]:
    t = " ".join(text.lower().split())
    if len(t) < k:
        return []
    hs = [_h(t[i : i + k]) for i in range(len(t) - k + 1)]
    n_win = max(1, len(hs) - w + 1)
    return sorted({min(hs[j : j + w]) for j in range(n_win)})


def test_winnow_matches_reference(spark):
    texts = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "the QUICK   brown fox jumps over the lazy dog"),  # same after norm
        (2, "completely different content here with no overlap at all"),
        (3, "short"),  # < k, dropped
        (4, "exactly8c"),  # one gram > k, fewer grams than w
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: list(r.fingerprints)
        for r in winnow_fingerprints(docs, k=8, w=4).collect()
    }
    want = {d: _ref_winnow(t, 8, 4) for d, t in texts if len(" ".join(t.lower().split())) >= 8}
    assert got == want
    # normalization: docs 0 and 1 are identical fingerprints
    assert got[0] == got[1]


def test_winnow_shared_substring_guarantee(spark):
    # winnowing guarantees a shared substring of length >= k + w - 1
    # (= 11 here) yields at least one shared fingerprint
    shared = "abcdefghijklmno"
    docs = spark.createDataFrame(
        [(0, "xxxx " + shared + " yyyy"), (1, "zz " + shared + " qq")],
        "doc_id long, text string",
    )
    pairs = winnow_near_dups(docs, k=8, w=4, min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0].shared >= 1


def test_winnow_near_dups_overlap_filter(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog today ok"),
            (2, "unrelated words entirely absent from the other documents"),
        ],
        "doc_id long, text string",
    )
    pairs = winnow_near_dups(docs, k=8, w=4, min_shared=2, min_overlap=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(0, 1)}
    assert pairs[0].overlap >= 0.5


def test_stupid_backoff_tiers(spark):
    model = spark.createDataFrame(
        [(0, "a b c a b d")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "a b c"), (2, "x c b d"), (3, "q q z")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: (r.n_trigrams, r.sb_ppl)
        for r in stupid_backoff_scores(score, model_docs=model).collect()
    }
    n = 6  # model tokens
    # d1: (a,b,c) seen: c3=1 / c2(a,b)=2 -> 0.5
    assert rows[1] == (1, pytest.approx(round(math.exp(-math.log(0.5)), 4)))
    # d2: (x,c,b) -> bigram (c,b) unseen, unigram b seen: 0.4^2 * 2/6
    #     (c,b,d) -> trigram unseen, bigram (b,d) seen: 0.4 * 1/ c(b)=2
    s1 = 0.4 * 0.4 * 2 / n
    s2 = 0.4 * 1 / 2
    want2 = round(math.exp(-(math.log(s1) + math.log(s2)) / 2), 4)
    assert rows[2] == (2, pytest.approx(want2))
    # d3: (q,q,z) -> everything unseen: floor 0.4^3 / N
    want3 = round(math.exp(-math.log(0.4**3 / n)), 4)
    assert rows[3] == (1, pytest.approx(want3))


def test_stupid_backoff_self_trained_never_backs_off(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "b c d e")], "doc_id long, text string"
    )
    rows = stupid_backoff_scores(docs).collect()
    # every trigram is in the model, so every score is c3/c2 >= 1/2 here
    # and ppl is finite and small
    assert all(r.sb_ppl <= 2.0 for r in rows)


def test_kneser_ney_hand_computed(spark):
    from tokenkit_spark.ops.textstats import kneser_ney_perplexity

    # model: bigrams (a,b)x2, (b,a), (b,c) -> c(a)=2 ctx... ctx counts are
    # over bigram FIRST words: c(a)=2, T(a)=1; c(b)=2, T(b)=2
    model = spark.createDataFrame([(0, "a b a b c")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "a b"), (2, "z q")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.n_bigrams, r.kn_ppl)
        for r in kneser_ney_perplexity(score, model_docs=model).collect()
    }
    n_types, v = 3, 3  # bigram types {ab, ba, bc}; vocab {a,b,c}
    def pc(n_left):
        return (n_left + 1.0) / (n_types + v + 1.0)
    # (a,b): c12=2, c(a)=2, T(a)=1, N1+(.b)=1
    p_ab = (2 - 0.75) / 2 + 0.75 * 1 / 2 * pc(1)
    assert rows[1] == (1, pytest.approx(round(math.exp(-math.log(p_ab)), 4)))
    # (z,q): unseen context -> pure continuation floor, N1+(.q)=0
    p_zq = pc(0)
    assert rows[2] == (1, pytest.approx(round(math.exp(-math.log(p_zq)), 4)))


def test_kneser_ney_continuation_beats_frequency(spark):
    from tokenkit_spark.ops.textstats import kneser_ney_perplexity

    # 'francisco' is frequent but only ever follows 'san'; 'the' is as
    # frequent but follows many contexts. After a NOVEL context, KN must
    # predict 'the' better than 'francisco'.
    model = spark.createDataFrame(
        [(0, "san francisco san francisco san francisco "
             "eat the cake see the dog run the race")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(1, "novel francisco"), (2, "novel the")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.kn_ppl for r in
            kneser_ney_perplexity(score, model_docs=model).collect()}
    assert rows[2] < rows[1]  # lower perplexity = better predicted
