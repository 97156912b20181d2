"""Session-H batch 3: BM25-MaxP, source divergence, BPE fertility."""

import math

import pytest
from pyspark.sql import functions as F


class TestMaxP:
    def test_passage_grid_covers_every_token(self, spark):
        # 100 tokens, window 30 stride 15 -> 6 passages, all covered
        text = " ".join(f"w{i}" for i in range(100))
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        from tokenkit_spark.index.maxp import passage_tokens

        rows = passage_tokens(docs, window=30, stride=15).collect()
        assert {r["pidx"] for r in rows} == set(range(6))
        assert {r["term"] for r in rows} == {f"w{i}" for i in range(100)}
        # last passage overruns and is short: starts at token 76 (1-based)
        last = [r for r in rows if r["pidx"] == 5]
        assert len(last) == 25

    def test_short_doc_single_passage(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b c")], "doc_id long, text string"
        )
        from tokenkit_spark.index.maxp import passage_tokens

        rows = passage_tokens(docs, window=30, stride=15).collect()
        assert {r["pidx"] for r in rows} == {0}
        assert len(rows) == 3

    def test_maxp_rescues_diluted_long_doc(self, spark):
        # doc 0: relevant burst inside a long page; doc 1: one mention in
        # a short page. Whole-doc BM25 would punish doc 0's length;
        # passage scoring sees the dense window.
        burst = "needle needle needle needle needle"
        long_doc = (
            " ".join(f"pad{i}" for i in range(60))
            + " " + burst + " "
            + " ".join(f"tail{i}" for i in range(60))
        )
        short_doc = "needle " + " ".join(f"x{i}" for i in range(10))
        docs = spark.createDataFrame(
            [(0, long_doc), (1, short_doc)], "doc_id long, text string"
        )
        queries = spark.createDataFrame(
            [(0, "needle")], "query_id long, text string"
        )
        from tokenkit_spark.index.maxp import maxp_top_k

        out = maxp_top_k(docs, queries, k=10).collect()
        assert out[0]["doc_id"] == 0  # the burst wins under MaxP
        assert out[0]["rank"] == 1 and len(out) == 2


class TestSourceDivergence:
    def test_identical_sources_have_zero_divergence(self, spark):
        docs = spark.createDataFrame(
            [(0, "alpha beta gamma", "s1"), (1, "alpha beta gamma", "s2")],
            "doc_id long, text string, source string",
        )
        from tokenkit_spark.ops.divergence import source_divergence

        r = source_divergence(docs).collect()[0]
        assert r["kl_ab"] == 0.0 and r["kl_ba"] == 0.0 and r["jsd"] == 0.0

    def test_matches_hand_computed_kl(self, spark):
        docs = spark.createDataFrame(
            [(0, "a a b", "s1"), (1, "b b c", "s2")],
            "doc_id long, text string, source string",
        )
        from tokenkit_spark.ops.divergence import source_divergence

        r = source_divergence(docs, alpha=0.5).collect()[0]
        v = 3  # vocab {a, b, c}
        pa = {t: (c + 0.5) / (3 + 0.5 * v) for t, c in
              {"a": 2, "b": 1, "c": 0}.items()}
        pb = {t: (c + 0.5) / (3 + 0.5 * v) for t, c in
              {"a": 0, "b": 2, "c": 1}.items()}
        kl_ab = sum(pa[t] * math.log(pa[t] / pb[t]) for t in pa)
        kl_ba = sum(pb[t] * math.log(pb[t] / pa[t]) for t in pa)
        jsd = sum(
            0.5 * pa[t] * math.log(pa[t] / ((pa[t] + pb[t]) / 2))
            + 0.5 * pb[t] * math.log(pb[t] / ((pa[t] + pb[t]) / 2))
            for t in pa
        )
        assert r["vocab_size"] == v
        assert r["kl_ab"] == pytest.approx(kl_ab, abs=1e-6)
        assert r["kl_ba"] == pytest.approx(kl_ba, abs=1e-6)
        assert r["jsd"] == pytest.approx(jsd, abs=1e-6)
        # JSD is bounded by ln(2) and symmetric-positive
        assert 0 < r["jsd"] < math.log(2)


class TestBpeFertility:
    def test_fertility_accounting(self, spark):
        from tokenkit_spark.ops.bpe import _encode_word, bpe_fertility

        merges = [("a", "b"), ("ab", "c")]
        docs = spark.createDataFrame(
            [(0, "abc abd", "en"), (1, "abc", "xx")],
            "doc_id long, text string, lang string",
        )
        out = {r["lang"]: r for r in bpe_fertility(docs, merges).collect()}
        ranks = {p: i for i, p in enumerate(merges)}
        # "abc" -> ["abc"] (1 token), "abd" -> ["ab","d"] (2 tokens);
        # pretokenizer may attach leading spaces, so derive expected
        # counts from the same encoder
        n_abc = len(_encode_word("abc", ranks))
        assert out["xx"]["n_tokens"] == n_abc
        assert out["xx"]["n_docs"] == 1
        assert out["en"]["n_words"] == 2
        assert out["en"]["fertility"] >= out["xx"]["fertility"]
        # chars conserved: chars_per_token * n_tokens == total pretoken
        # chars (pretokens may carry their leading space)
        import regex as _re

        from tokenkit_spark.ops.textstats import BPE_PRETOKEN_PATTERN

        rx = _re.compile(BPE_PRETOKEN_PATTERN)
        texts = {"en": "abc abd", "xx": "abc"}
        for lang, r in out.items():
            want_chars = sum(len(w) for w in rx.findall(texts[lang]))
            assert r["chars_per_token"] * r["n_tokens"] == pytest.approx(
                want_chars, rel=1e-3
            )
