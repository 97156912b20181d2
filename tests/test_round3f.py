"""Session-H batch 4: Gopher gate, LTR rerank, SALSA, query
segmentation."""

import pytest
from pyspark.sql import functions as F


class TestGopherGate:
    def test_rule_verdicts(self, spark):
        good = " ".join(
            ["the", "be", "to", "of"] + [f"word{i}" for i in range(60)]
        )
        too_short = "the of tiny"
        symbol_heavy = " ".join(["the", "of"] + ["###"] * 60)
        bullets = "\n".join(["the be of list item word here ok fine"] + [
            f"- bullet {i} item entry line" for i in range(40)
        ])
        docs = spark.createDataFrame(
            [(0, good), (1, too_short), (2, symbol_heavy), (3, bullets)],
            "doc_id long, text string",
        )
        from tokenkit_spark.ops.webclean import gopher_gate

        out = {r["doc_id"]: r for r in gopher_gate(docs).collect()}
        assert out[0]["gopher_pass"]
        assert out[0]["stopword_hits"] == 4
        assert not out[1]["gopher_pass"]  # word count < 50
        assert not out[2]["gopher_pass"]
        assert out[2]["symbol_ratio"] > 0.1
        assert not out[3]["gopher_pass"]  # bullet_frac > 0.9
        assert out[3]["bullet_frac"] > 0.9

    def test_dup_line_and_ellipsis(self, spark):
        text = "\n".join(
            ["the be of and repeated line..."] * 8
            + [" ".join(f"w{i}" for i in range(60))]
        )
        docs = spark.createDataFrame(
            [(0, text)], "doc_id long, text string"
        )
        from tokenkit_spark.ops.webclean import gopher_gate

        r = gopher_gate(docs).collect()[0]
        # 9 lines, 2 distinct -> dup fraction 7/9; 8 of 9 end in ellipsis
        assert r["dup_line_frac"] == pytest.approx(7 / 9, abs=1e-3)
        assert r["ellipsis_frac"] == pytest.approx(8 / 9, abs=1e-3)
        assert not r["gopher_pass"]


class TestSalsa:
    def test_mass_conservation_and_authority_order(self, spark):
        # 2 is the strong authority (3 in-links), 5 weak (1)
        rows = [(1, 2), (3, 2), (4, 2), (1, 5)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        from tokenkit_spark.ops.linkgraph import salsa_authorities, top_salsa

        s = {r["node"]: r["salsa"] for r in
             salsa_authorities(edges, n_iter=3).collect()}
        assert sum(s.values()) == pytest.approx(1.0, abs=1e-9)
        assert s[2] > s[5]
        top = top_salsa(edges, k=2, n_iter=3).collect()
        assert top[0]["node"] == 2 and top[0]["rank"] == 1

    def test_stationary_on_symmetric_graph(self, spark):
        # two disjoint hub->authority stars of equal size: equal scores
        rows = [(1, 10), (2, 10), (3, 20), (4, 20)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        from tokenkit_spark.ops.linkgraph import salsa_authorities

        s = {r["node"]: r["salsa"] for r in
             salsa_authorities(edges, n_iter=4).collect()}
        assert s[10] == pytest.approx(s[20], abs=1e-12)


class TestQuerySegments:
    def test_collocation_fuses_random_pair_splits(self, spark):
        # corpus: "new york" always adjacent; "cheap york" never occurs
        docs = spark.createDataFrame(
            [(i, "visit new york city today " + f"filler{i} oh") for i in range(6)],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "cheap new york hotels")], "query_id long, text string"
        )
        from tokenkit_spark.ops.textstats import segment_queries

        segs = segment_queries(
            docs, queries, pmi_threshold=1.0, min_pair_count=2
        ).collect()
        texts = [r["segment"] for r in segs]
        assert "new york" in texts  # fused by high PMI
        assert "cheap" in texts  # no corpus evidence -> own segment
        # seg indexes are consecutive from 0 in position order
        assert [r["seg_idx"] for r in segs] == list(range(len(segs)))

    def test_singleton_segments_without_evidence(self, spark):
        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta")], "doc_id long, text string"
        )
        queries = spark.createDataFrame(
            [(0, "zeta eta theta")], "query_id long, text string"
        )
        from tokenkit_spark.ops.textstats import segment_queries

        segs = segment_queries(docs, queries, min_pair_count=2).collect()
        assert len(segs) == 3
        assert all(r["n_terms"] == 1 for r in segs)


class TestLtrRerank:
    def test_rerank_preserves_candidate_set(self, spark, sf_dir):
        import __spark_entry__ as e

        base = {
            (r["query_id"], r["doc_id"])
            for r in e.q_ltr_features(spark, sf_dir).collect()
        }
        rer = e.q_ltr_rerank(spark, sf_dir).collect()
        assert {(r["query_id"], r["doc_id"]) for r in rer} == base
        # ranks are a permutation 1..n per query
        by_q = {}
        for r in rer:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
