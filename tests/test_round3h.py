"""Session-H batch 6: RAKE, mirror detection, BIC codec audit,
next-word phrase acceleration."""

import pytest


class TestRake:
    def test_paper_style_scoring(self, spark):
        # "of" is a delimiter: candidates are "deep learning" and
        # "deep networks"; deg(deep)=4 freq=2, deg(learning)=2 freq=1
        docs = spark.createDataFrame(
            [(0, "deep learning of deep networks")], "doc_id long, text string"
        )
        from tokenkit_spark.ops.rake import rake_keywords

        rows = rake_keywords(docs, k=5).collect()
        got = {r["phrase"]: r for r in rows}
        assert set(got) == {"deep learning", "deep networks"}
        # each phrase: deg/freq(deep)=2 + deg/freq(other)=2 -> 4.0
        assert got["deep learning"]["score"] == pytest.approx(4.0)
        assert got["deep networks"]["score"] == pytest.approx(4.0)
        # tie broken by phrase asc
        assert got["deep learning"]["rank"] == 1

    def test_punctuation_delimits(self, spark):
        docs = spark.createDataFrame(
            [(0, "red car, blue bike")], "doc_id long, text string"
        )
        from tokenkit_spark.ops.rake import rake_keywords

        phrases = {r["phrase"] for r in rake_keywords(docs, k=5).collect()}
        # the comma ends the first run ("car," trims to content word
        # "car" but "red car" and "blue bike" stay separate phrases)
        assert phrases == {"red car", "blue bike"}


class TestMirrorHosts:
    def test_exact_mirror_found(self, spark):
        body = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [("a.com", body), ("b.com", body), ("c.com",
             "one two three four five six seven eight")],
            "host string, text string",
        )
        from tokenkit_spark.ops.mirrors import mirror_pairs

        rows = mirror_pairs(docs, min_resemblance=0.5).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["host_a"], r["host_b"]) == ("a.com", "b.com")
        assert r["resemblance"] == 1.0 and r["containment"] == 1.0

    def test_shingle_df_cap_drops_boilerplate(self, spark):
        # a shingle on every host is boilerplate: with cap 2 it cannot
        # create candidate pairs between otherwise-disjoint hosts
        boiler = "copyright acme corp"
        docs = spark.createDataFrame(
            [("a.com", boiler + " unique alpha content"),
             ("b.com", boiler + " unique beta content"),
             ("c.com", boiler + " unique gamma content")],
            "host string, text string",
        )
        from tokenkit_spark.ops.mirrors import mirror_pairs

        capped = mirror_pairs(
            docs, min_resemblance=0.0, max_shingle_df=2
        ).collect()
        assert capped == []
        uncapped = mirror_pairs(
            docs, min_resemblance=0.0, max_shingle_df=None
        ).collect()
        assert len(uncapped) == 3


def _bic_cost_ref(ids, lo, hi):
    """Reference recursive implementation of the audited cost model."""
    m = len(ids)
    if m == 0:
        return 0
    h = m // 2
    x = ids[h]
    r = hi - lo + 2 - m
    bits = 0 if r <= 1 else (r - 1).bit_length()
    return (bits + _bic_cost_ref(ids[:h], lo, x - 1)
            + _bic_cost_ref(ids[h + 1:], x + 1, hi))


class TestBicAudit:
    def test_dense_run_costs_zero(self, spark):
        # ids 0..7 with universe 7: every node's range is forced
        rows = [("t", i) for i in range(8)]
        postings = spark.createDataFrame(rows, "term string, doc_id long")
        from tokenkit_spark.index.bic import bic_audit

        out = bic_audit(postings, k=5).collect()
        assert len(out) == 1 and out[0]["bic_bits"] == 0
        assert out[0]["varint_bits"] == 8 * 8  # eight 1-byte gaps

    def test_matches_reference_recursion(self, spark):
        lists = {
            "a": [0, 3, 4, 5, 6, 17, 25, 26, 27, 300],
            "b": [2, 9, 12, 76],
            "c": [500],
        }
        rows = [(t, i) for t, ids in lists.items() for i in ids]
        postings = spark.createDataFrame(rows, "term string, doc_id long")
        from tokenkit_spark.index.bic import bic_audit

        u = max(max(v) for v in lists.values())
        got = {r["term"]: r["bic_bits"] for r in
               bic_audit(postings, k=10).collect()}
        for t, ids in lists.items():
            assert got[t] == _bic_cost_ref(ids, 0, u), t

    def test_bic_beats_varint_on_clustered_ids(self, spark):
        ids = list(range(100)) + [10_000]
        postings = spark.createDataFrame(
            [("t", i) for i in ids], "term string, doc_id long"
        )
        from tokenkit_spark.index.bic import bic_audit

        r = bic_audit(postings, k=1).collect()[0]
        assert r["bic_bits"] < r["varint_bits"] / 4


class TestNextword:
    def _docs(self, spark):
        rows = [(i, "the quick brown fox jumps " * 3) for i in range(4)]
        rows += [(9, "unique snow leopard sighting")]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_accelerated_plan_parity_and_cheaper(self, spark):
        phrases = spark.createDataFrame(
            [(0, "quick brown fox"), (1, "snow leopard")],
            "query_id long, text string",
        )
        from tokenkit_spark.index.nextword import nextword_audit

        out = {r["query_id"]: r for r in
               nextword_audit(self._docs(spark), phrases, top_b=5).collect()}
        q0 = out[0]
        assert q0["plan"] == "nextword" and q0["identical"]
        assert q0["n_matches"] == 4
        assert q0["rows_nextword"] < q0["rows_positional"]
        # "snow leopard" bigram is rare -> not in top-5 -> fallback
        q1 = out[1]
        assert q1["plan"] == "positional" and q1["n_matches"] == 1
        assert q1["rows_nextword"] == 0

    def test_no_false_phrase_matches(self, spark):
        # words present but never adjacent in order
        docs = spark.createDataFrame(
            [(0, "fox brown quick " * 10)], "doc_id long, text string"
        )
        phrases = spark.createDataFrame(
            [(0, "quick brown fox")], "query_id long, text string"
        )
        from tokenkit_spark.index.nextword import nextword_audit

        r = nextword_audit(docs, phrases, top_b=10).collect()[0]
        # "quick brown"/"brown fox" never occur; plan falls back and
        # the positional evaluator finds no aligned start
        assert r["n_matches"] == 0 and r["identical"]
