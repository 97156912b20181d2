"""Session-H batch 5: spam mass, code-switch windows, query relaxation."""

import pytest


class TestSpamMass:
    def test_spam_farm_vs_trusted_cluster(self, spark):
        # trusted cluster {1,2} interlinked; spam farm {100,101}
        # unreachable from trust
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (100, 101), (101, 100)], "src long, dst long"
        )
        from tokenkit_spark.ops.linkgraph import spam_mass

        out = {r["node"]: r for r in
               spam_mass(edges, trusted_seeds=[1], n_iter=6, k=10).collect()}
        # spam farm earns ~all its PageRank outside trust flow
        assert out[100]["spam_mass"] > 0.9
        assert out[101]["spam_mass"] > 0.9
        # trusted seed and its neighborhood hold most of their rank
        assert out[1]["spam_mass"] < 0.2
        assert out[2]["spam_mass"] < 0.2
        # mass = (pr - trustrank) / pr by construction
        r = out[100]
        assert r["spam_mass"] == pytest.approx(
            (r["pr"] - r["trustrank"]) / r["pr"], abs=1e-5
        )

    def test_rank_is_mass_desc(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (9, 8), (8, 9)], "src long, dst long"
        )
        from tokenkit_spark.ops.linkgraph import spam_mass

        rows = spam_mass(edges, trusted_seeds=[1], n_iter=4, k=10).collect()
        masses = [r["spam_mass"] for r in rows]
        assert masses == sorted(masses, reverse=True)
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


class TestCodeSwitchWindows:
    def test_bilingual_doc_flagged(self, spark):
        en = "the of and to a in is for " * 3  # 24 en tokens
        es = "el la de que y en un una " * 3  # 24 es tokens
        docs = spark.createDataFrame(
            [(0, en + es), (1, en + en)], "doc_id long, text string"
        )
        from tokenkit_spark.ops.textstats import code_switch_windows

        out = {r["doc_id"]: r for r in
               code_switch_windows(docs, window=20).collect()}
        assert out[0]["code_switched"]
        assert out[0]["n_langs"] == 2
        assert out[0]["switches"] >= 1
        assert not out[1]["code_switched"]
        assert out[1]["dominant_lang"] == "en"
        assert out[1]["minority_frac"] == 0.0

    def test_window_count(self, spark):
        docs = spark.createDataFrame(
            [(0, " ".join(["tok"] * 45)), (1, "x")], "doc_id long, text string"
        )
        from tokenkit_spark.ops.textstats import code_switch_windows

        out = {r["doc_id"]: r for r in
               code_switch_windows(docs, window=20).collect()}
        assert out[0]["n_windows"] == 3  # ceil(45/20)
        assert out[1]["n_windows"] == 1


class TestQueryRelaxation:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "apple banana"), (2, "apple banana"), (3, "apple banana"),
             (4, "apple cherry")],
            "doc_id long, text string",
        )

    def test_satisfied_at_level_zero(self, spark):
        queries = spark.createDataFrame(
            [(0, "apple banana")], "query_id long, text string"
        )
        from tokenkit_spark.index.relax import relaxation_ladder

        rows = relaxation_ladder(self._docs(spark), queries, k=3).collect()
        lv0 = next(r for r in rows if r["level"] == 0)
        assert lv0["n_matches"] == 3 and lv0["chosen"]
        # drop-order ascending: highest-df term (apple, df=4) first
        assert lv0["kept_terms"] == "apple banana"
        assert sum(r["chosen"] for r in rows) == 1

    def test_unsatisfiable_chooses_deepest(self, spark):
        queries = spark.createDataFrame(
            [(0, "apple banana zzz")], "query_id long, text string"
        )
        from tokenkit_spark.index.relax import relaxation_ladder

        rows = {r["level"]: r for r in relaxation_ladder(
            self._docs(spark), queries, k=3).collect()}
        assert len(rows) == 3
        # zzz (df 0) is maximally selective: kept until the end, so no
        # level ever matches and the deepest level is reported chosen
        assert all(r["n_matches"] == 0 for r in rows.values())
        assert rows[2]["chosen"] and not rows[0]["chosen"]
        assert rows[2]["kept_terms"] == "zzz"

    def test_relaxation_drops_least_selective_first(self, spark):
        # "cherry zzz" -> level 0: {cherry,zzz} 0 hits; level 1 drops
        # cherry (higher df) keeping zzz; never k hits -> deepest chosen
        queries = spark.createDataFrame(
            [(0, "cherry zzz")], "query_id long, text string"
        )
        from tokenkit_spark.index.relax import relaxation_ladder

        rows = {r["level"]: r for r in relaxation_ladder(
            self._docs(spark), queries, k=1).collect()}
        assert rows[0]["kept_terms"] == "cherry zzz"
        assert rows[0]["n_matches"] == 0
        assert rows[1]["kept_terms"] == "zzz"
        assert rows[0]["chosen"] is False and rows[1]["chosen"] is True
