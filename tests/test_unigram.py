"""Unigram-LM vocabulary induction (ops/unigram.py): Viterbi kernel
unit tests + distributed-vs-independent-reference training parity."""

import math

import pytest

from tokenkit_spark.ops.unigram import train_unigram, viterbi_segment


def test_viterbi_prefers_higher_likelihood():
    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    assert viterbi_segment("ab", logp, 6) == ["ab"]
    assert viterbi_segment("aab", logp, 6) == ["a", "ab"]


def test_viterbi_tie_breaks_toward_longer_piece():
    # p(ab) == p(a)*p(b) exactly -> equal path scores; longer piece wins
    logp = {"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.25)}
    assert viterbi_segment("ab", logp, 6) == ["ab"]


def test_viterbi_falls_back_to_chars():
    logp = {"x": math.log(0.5), "y": math.log(0.5)}
    assert viterbi_segment("xy", logp, 6) == ["x", "y"]


TEXTS = [
    "internationalization international nation nationalism",
    "station nation ration rational operation",
    "the the the a a an of of",
]


def test_train_unigram_matches_independent_reference(spark):
    import __spark_entry__ as entry

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    kw = dict(max_vocab=30, seed_size=40, max_piece_len=6, n_iter=3)
    got = [(p, round(lp, 6)) for p, lp in train_unigram(docs, **kw)]

    import regex as re

    from tokenkit_spark.ops.textstats import BPE_PRETOKEN_PATTERN

    rx = re.compile(BPE_PRETOKEN_PATTERN)
    pt = {}
    for t in TEXTS:
        for w in rx.findall(t):
            pt[w] = pt.get(w, 0) + 1
    want = [
        (p, round(lp, 6))
        for p, lp in entry._unigram_ref_train(list(pt.items()), **kw)
    ]
    assert got == want
    assert len(got) >= 20


def test_train_unigram_learns_frequent_subword(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    model = dict(train_unigram(
        docs, max_vocab=30, seed_size=40, max_piece_len=6, n_iter=3
    ))
    # 'nation'/'ation' dominate this corpus; a multi-char piece covering
    # them must survive pruning with prob above any stray letter
    multi = [p for p in model if len(p) >= 4]
    assert any("ation" in p or "nation" in p for p in multi), multi
