"""Session-H batch 9: corpus-driven stopword induction, CombSUM/
CombMNZ fusion, posting-list cache audit, term-vs-doc layout audit."""

import pytest


class TestStopwordInduction:
    def test_function_word_beats_topical_burst(self, spark):
        # "the" appears once in every doc (uniform, widespread);
        # "zebra" appears 4 times but all inside one doc (bursty).
        docs = spark.createDataFrame(
            [
                (0, "the cat zebra zebra zebra zebra"),
                (1, "the dog runs"),
                (2, "the bird sings"),
                (3, "the fish swims"),
            ],
            "doc_id long, text string",
        )
        from tokenkit_spark.ops.stopwords import induce_stopwords

        rows = {r["term"]: r for r in induce_stopwords(docs, top_n=10).collect()}
        assert "the" in rows
        assert "zebra" not in rows  # df=1 excluded by min_df
        the = rows["the"]
        assert the["df"] == 4 and the["cf"] == 4
        assert the["df_ratio"] == 1.0
        assert the["burstiness"] == 1.0
        # uniform distribution => normalized entropy exactly 1
        assert the["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
        assert rows["the"]["rank"] == 1

    def test_entropy_penalizes_skew(self, spark):
        # "skew": 9 occurrences in doc 0, 1 in doc 1 => low entropy;
        # "flat": 1 occurrence in each => entropy 1.0
        docs = spark.createDataFrame(
            [
                (0, " ".join(["skew"] * 9) + " flat"),
                (1, "skew flat"),
            ],
            "doc_id long, text string",
        )
        from tokenkit_spark.ops.stopwords import induce_stopwords

        rows = {r["term"]: r for r in induce_stopwords(docs, top_n=10).collect()}
        assert rows["flat"]["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
        import math

        # H = -(0.9 ln 0.9 + 0.1 ln 0.1) / ln 2
        h = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1)) / math.log(2)
        assert rows["skew"]["norm_entropy"] == pytest.approx(h, abs=1e-4)
        assert rows["skew"]["burstiness"] == 5.0
        assert rows["flat"]["rank"] < rows["skew"]["rank"]


class TestCombFusion:
    def _leg(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, rank long, doc_id long, score double"
        )

    def test_combsum_and_mnz(self, spark):
        from tokenkit_spark.index.hybrid import comb_fuse

        # retriever A: docs 1,2,3 scores 10,5,0 -> norms 1.0,0.5,0.0
        a = self._leg(spark, [(0, 1, 1, 10.0), (0, 2, 2, 5.0), (0, 3, 3, 0.0)])
        # retriever B: docs 2,4 scores 4,2 -> norms 1.0,0.0
        b = self._leg(spark, [(0, 1, 2, 4.0), (0, 2, 4, 2.0)])
        out = {r["doc_id"]: r for r in comb_fuse([a, b], k=10).collect()}
        assert out[2]["combsum"] == pytest.approx(1.5)
        assert out[2]["combmnz"] == pytest.approx(3.0)  # 1.5 * 2 retrievers
        assert out[2]["n_retrievers"] == 2
        assert out[1]["combsum"] == pytest.approx(1.0)
        assert out[1]["combmnz"] == pytest.approx(1.0)
        # MNZ rewards multi-retriever agreement: doc 2 outranks doc 1
        assert out[2]["rank"] == 1 and out[1]["rank"] == 2
        assert out[4]["combmnz"] == pytest.approx(0.0)

    def test_degenerate_equal_scores_normalize_to_one(self, spark):
        from tokenkit_spark.index.hybrid import comb_fuse

        a = self._leg(spark, [(0, 1, 1, 7.0), (0, 2, 2, 7.0)])
        out = {r["doc_id"]: r for r in comb_fuse([a], k=10).collect()}
        assert out[1]["combsum"] == pytest.approx(1.0)
        assert out[2]["combsum"] == pytest.approx(1.0)


class TestPostingCache:
    def test_qtfdf_prefix_and_rates(self, spark):
        from tokenkit_spark.index.cache import posting_cache_audit

        docs = spark.createDataFrame(
            [
                (0, "hot hot cold"),
                (1, "hot warm"),
                (2, "hot warm cold rare"),
            ],
            "doc_id long, text string",
        )
        # log: "hot" x3, "warm cold" x1, "missing" x1 (OOV)
        log = spark.createDataFrame(
            [("hot",), ("hot",), ("hot",), ("warm cold",), ("missing",)],
            "qtext string",
        )
        # df: hot=3, warm=2, cold=2, rare=1; qtf: hot=3, warm=1, cold=1
        # ratio: hot=1.0, warm=0.5, cold=0.5 (tie -> qtf desc, term asc)
        # order: hot(cum 3), cold(cum 5), warm(cum 7)
        out = {r["budget_rows"]: r for r in posting_cache_audit(
            log, docs, budgets=[3, 5, 7]).collect()}
        assert out[3]["n_terms_cached"] == 1 and out[3]["rows_cached"] == 3
        assert out[3]["term_hit_rate"] == pytest.approx(3 / 5)
        assert out[5]["n_terms_cached"] == 2
        assert out[7]["term_hit_rate"] == pytest.approx(1.0)
        assert out[7]["traffic_saved_frac"] == pytest.approx(1.0)
        # traffic: hot 3*3=9 of total 9+2+2=13
        assert out[3]["traffic_saved_frac"] == pytest.approx(9 / 13, abs=1e-4)


class TestPartitionLayout:
    def test_cost_models(self, spark):
        from tokenkit_spark.index.layout import partition_layout_audit

        docs = spark.createDataFrame(
            [(0, "a b"), (1, "a c"), (2, "a b c")],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "a b")], "query_id long, text string"
        )
        out = {r["layout"]: r for r in partition_layout_audit(
            docs, queries, n_shards=4, k=2).collect()}
        # df: a=3, b=2 => q_df = 5
        doc = out["doc"]
        assert doc["avg_wall_cost"] == pytest.approx(5 / 4 + 2 * 4)
        assert doc["avg_messages"] == 4.0
        assert doc["max_shard_load_factor"] == 1.0
        assert doc["total_scan_rows"] == 5
        term = out["term"]
        # messages = distinct shards touched by {a, b} (1 or 2)
        assert term["avg_messages"] in (1.0, 2.0)
        if term["avg_messages"] == 2.0:
            assert term["avg_wall_cost"] == pytest.approx(3 + 2 * 2)
            assert term["max_shard_load_factor"] == pytest.approx(3 / (5 / 4))
        else:  # both terms on one shard
            assert term["avg_wall_cost"] == pytest.approx(5 + 2 * 1)
            assert term["max_shard_load_factor"] == pytest.approx(5 / (5 / 4))
        assert term["total_scan_rows"] == 5
