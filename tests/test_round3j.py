"""Session-H batch 8: bowtie decomposition, coupling/co-citation,
intersection-order audit."""

import pytest


class TestBowtie:
    def test_textbook_bowtie(self, spark):
        # core cycle {1,2,3}; 10 -> core (IN); core -> 20 (OUT);
        # 30 -> 20 reaches OUT but not the core and the core never
        # reaches 30 (TENDRIL); {40,41} disconnected
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (1, 3),  # extra edge: 1 is max-degree
             (10, 1), (3, 20), (30, 20), (40, 41)],
            "src long, dst long",
        )
        from tokenkit_spark.ops.linkgraph import bowtie_decomposition

        out = {r["component"]: r["n_nodes"]
               for r in bowtie_decomposition(edges).collect()}
        assert out["CORE"] == 3
        assert out["IN"] == 1  # node 10
        assert out["OUT"] == 1  # node 20
        assert out["TENDRIL"] == 1  # node 30
        assert out["DISCONNECTED"] == 2  # 40, 41
        total = sum(out.values())
        assert total == 8

    def test_fracs_sum_to_one(self, spark, sf_dir):
        import __spark_entry__ as e

        rows = e.q_bowtie(spark, sf_dir).collect()
        assert sum(r["n_nodes"] for r in rows) > 0
        assert sum(r["frac"] for r in rows) == pytest.approx(1.0, abs=1e-3)


class TestCouplingCocitation:
    def test_coupling_counts_shared_outlinks(self, spark):
        edges = spark.createDataFrame(
            [(1, 100), (1, 101), (2, 100), (2, 101), (3, 100), (3, 999)],
            "src long, dst long",
        )
        from tokenkit_spark.ops.linkgraph import coupling_cocitation

        rows = {(r["a"], r["b"]): r for r in
                coupling_cocitation(edges, mode="coupling", k=10).collect()}
        assert rows[(1, 2)]["shared"] == 2
        assert rows[(1, 2)]["jaccard"] == 1.0
        assert rows[(1, 3)]["shared"] == 1
        assert rows[(1, 3)]["jaccard"] == pytest.approx(1 / 3, abs=1e-3)

    def test_cocitation_is_coupling_on_reversed_graph(self, spark):
        edges = spark.createDataFrame(
            [(1, 100), (2, 100), (1, 200), (2, 200), (5, 300)],
            "src long, dst long",
        )
        rev = spark.createDataFrame(
            [(100, 1), (100, 2), (200, 1), (200, 2), (300, 5)],
            "src long, dst long",
        )
        from tokenkit_spark.ops.linkgraph import coupling_cocitation

        a = sorted(map(tuple, coupling_cocitation(
            edges, mode="cocitation", k=10).collect()))
        b = sorted(map(tuple, coupling_cocitation(
            rev, mode="coupling", k=10).collect()))
        assert a == b

    def test_hub_cap_prevents_pair_blowup(self, spark):
        # one center linked by every fan: capped out of the join
        edges = spark.createDataFrame(
            [(i, 7) for i in range(50)] + [(1, 8), (2, 8)],
            "src long, dst long",
        )
        from tokenkit_spark.ops.linkgraph import coupling_cocitation

        rows = coupling_cocitation(
            edges, mode="coupling", k=100, max_df=10
        ).collect()
        # only the (1,2) pair via center 8 survives the cap
        assert len(rows) == 1
        assert (rows[0]["a"], rows[0]["b"], rows[0]["shared"]) == (1, 2, 1)


class TestIntersectOrder:
    def test_ascending_df_cheaper(self, spark):
        # "common" in every doc, "rare" in one: query order
        # (common, rare) scans all docs as candidates after step 1;
        # ascending order starts from the rare list
        docs = spark.createDataFrame(
            [(i, "common " + ("rare" if i == 0 else "filler")) for i in
             range(100)],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "common rare")], "query_id long, text string"
        )
        from tokenkit_spark.index.intersect import intersection_order_audit

        r = intersection_order_audit(docs, queries).collect()[0]
        # sum_df = 101 both ways; query order carries 100 candidates
        # into step 2, ascending carries 1
        assert r["cost_query_order"] == 101 + 100
        assert r["cost_ascending"] == 101 + 1
        assert r["n_matches"] == 1
        assert r["saving_frac"] > 0.4

    def test_single_term_and_oov(self, spark):
        docs = spark.createDataFrame(
            [(0, "alpha")], "doc_id long, text string"
        )
        queries = spark.createDataFrame(
            [(0, "alpha"), (1, "missing")], "query_id long, text string"
        )
        from tokenkit_spark.index.intersect import intersection_order_audit

        out = {r["query_id"]: r for r in
               intersection_order_audit(docs, queries).collect()}
        assert out[0]["cost_query_order"] == 1 and out[0]["n_matches"] == 1
        assert out[1]["cost_query_order"] == 0 and out[1]["n_matches"] == 0
        assert out[1]["saving_frac"] == 0.0
