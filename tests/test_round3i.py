"""Session-H batch 7: tiered index guarantee, results cache audit,
word-break suggester, pivoted-norm + DFI similarities."""

import math

import pytest


class TestTieredEval:
    def test_guarantee_fires_when_nothing_pruned(self, spark):
        # 4 docs, every term's list <= keep: tier 1 IS the index
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(4)],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "alpha beta")], "query_id long, text string"
        )
        from tokenkit_spark.index.tiered import tiered_eval

        r = tiered_eval(docs, queries, keep_per_term=8, k=10).collect()[0]
        assert r["pruned_bound"] == 0.0
        assert r["guaranteed"] and r["identical"]
        assert r["tier1_frac"] == 1.0

    def test_guarantee_is_sound(self, spark, sf_dir):
        # soundness invariant on the real corpus: a certified answer
        # must actually match the full index
        import __spark_entry__ as e

        for r in e.q_tiered_fallback(spark, sf_dir).collect():
            if r["guaranteed"]:
                assert r["identical"], r

    def test_pruning_detected(self, spark):
        # one hot term spread over many docs with tiny keep: the bound
        # is positive and the audit reports the (possibly) lossy answer
        rows = [(i, "hot " * (20 - (i % 7)) + f"rare{i}") for i in range(30)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        queries = spark.createDataFrame(
            [(0, "hot")], "query_id long, text string"
        )
        from tokenkit_spark.index.tiered import tiered_eval

        r = tiered_eval(docs, queries, keep_per_term=4, k=10).collect()[0]
        assert r["pruned_bound"] > 0.0
        assert not r["guaranteed"]
        assert r["tier1_frac"] < 1.0


class TestStaticCache:
    def test_hit_math(self, spark):
        log = spark.createDataFrame(
            [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "qtext string"
        )
        docs = spark.createDataFrame(
            [(0, "a a b c x")], "doc_id long, text string"
        )
        from tokenkit_spark.index.cache import static_cache_audit

        out = {r["cache_size"]: r for r in
               static_cache_audit(log, docs, sizes=[1, 2, 3]).collect()}
        assert out[1]["hits"] == 6 and out[1]["hit_rate"] == 0.6
        assert out[2]["hits"] == 9
        assert out[3]["hit_rate"] == 1.0
        # infinite cache still misses each distinct query once
        assert out[1]["max_hit_rate"] == pytest.approx(0.7)
        # rows: a=2, b=1, c=1; total weighted = 6*2+3*1+1*1 = 16;
        # size-1 cache saves the 6 'a' hits' rows = 12
        assert out[1]["rows_saved_frac"] == pytest.approx(12 / 16, abs=1e-4)

    def test_monotone_in_cache_size(self, spark, sf_dir):
        import __spark_entry__ as e

        rows = e.q_results_cache(spark, sf_dir).collect()
        rates = [r["hit_rate"] for r in rows]
        assert rates == sorted(rates)
        assert rates[-1] == 1.0


class TestWordBreak:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(0, "hash join sort merge table data " * 3),
             (1, "hash table scan")],
            "doc_id long, text string",
        )

    def test_break_and_combine(self, spark):
        queries = spark.createDataFrame(
            [(0, "hashjoin"), (1, "ta ble"), (2, "hash join")],
            "query_id long, text string",
        )
        from tokenkit_spark.index.wordbreak import word_break_suggest

        rows = word_break_suggest(self._docs(spark), queries).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert by_q[0][0]["suggestion"] == "hash join"
        assert by_q[0][0]["kind"] == "break"
        assert by_q[1][0]["suggestion"] == "table"
        assert by_q[1][0]["kind"] == "combine"
        # both terms of query 2 are in-vocabulary: no suggestions
        assert 2 not in by_q

    def test_no_combine_for_real_word_pairs(self, spark):
        # "hash table" are both vocab words; "hashtable" is not
        # suggested even though the concatenation resembles a word
        docs = spark.createDataFrame(
            [(0, "hash table hashtable")], "doc_id long, text string"
        )
        queries = spark.createDataFrame(
            [(0, "hash table")], "query_id long, text string"
        )
        from tokenkit_spark.index.wordbreak import word_break_suggest

        assert word_break_suggest(docs, queries).collect() == []


class TestSimilarities:
    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [(0, "apple apple banana"), (1, "apple cherry date fig grape"),
             (2, "banana banana banana")],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "apple banana")], "query_id long, text string"
        )
        return docs, queries

    def test_pivoted_norm_formula(self, spark):
        docs, queries = self._fixture(spark)
        from tokenkit_spark.index.lmsim import pivoted_norm

        rows = {r["doc_id"]: r["score"] for r in
                pivoted_norm(docs, queries, slope=0.2).collect()}
        # doc 0: tf(apple)=2 tf(banana)=1, dl=3, avgdl=11/3, N=3,
        # df(apple)=2 df(banana)=2
        avgdl = 11 / 3
        norm = 0.8 + 0.2 * 3 / avgdl
        exp0 = ((1 + math.log(1 + math.log(2))) / norm * math.log(4 / 2)
                + (1 + math.log(1 + math.log(1))) / norm * math.log(4 / 2))
        assert rows[0] == pytest.approx(exp0, abs=1e-3)

    def test_dfi_zero_below_expectation(self, spark):
        docs, queries = self._fixture(spark)
        from tokenkit_spark.index.lmsim import dfi_standardized

        rows = {r["doc_id"]: r["score"] for r in
                dfi_standardized(docs, queries).collect()}
        # doc 2 is all banana: tf=3 >> e -> strongly positive; doc 1
        # has tf(apple)=1 vs e=(4+1)*5/12 ~ 2.08 -> clamped to 0
        assert rows[2] > rows[0] > 0
        assert rows[1] == 0.0
