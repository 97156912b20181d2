"""Session-H operators: OPIC importance, shard-routing audit,
character entropy, n-gram containment."""

import math

import pytest


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


class TestOpic:
    def test_matches_hand_rolled_recurrence(self, spark):
        # graph: 1->2, 1->3, 2->3, 4 dangling (appears only as dst? no -
        # make 3 dangling: it has no out-edges)
        rows = [(1, 2), (1, 3), (2, 3)]
        from tokenkit_spark.ops.linkgraph import opic_importance

        got = {
            r["node"]: r["importance"]
            for r in opic_importance(_edges(spark, rows), n_iter=3).collect()
        }
        # hand-rolled synchronous OPIC: nodes {1,2,3}, deg 1->2, 2->1
        nodes = [1, 2, 3]
        deg = {1: 2, 2: 1}
        cash = {v: 1 / 3 for v in nodes}
        hist = dict(cash)
        for _ in range(3):
            dm = sum(c for v, c in cash.items() if v not in deg)
            new = {}
            for v in nodes:
                inflow = sum(
                    cash[u] / deg[u]
                    for u, w in rows
                    if w == v and u in deg
                )
                new[v] = inflow + dm / 3
            cash = new
            for v in nodes:
                hist[v] += cash[v]
        want = {v: hist[v] / 4 for v in nodes}
        for v in nodes:
            assert got[v] == pytest.approx(want[v], abs=1e-12)
        # total importance mass is 1 (cash conservation)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_top_opic_rank_order(self, spark):
        rows = [(1, 2), (3, 2), (4, 2)]  # 2 is a dangling sink
        from tokenkit_spark.ops.linkgraph import top_opic

        out = top_opic(_edges(spark, rows), k=2, n_iter=2).collect()
        assert [r["rank"] for r in out] == [1, 2]
        assert out[0]["node"] == 2  # the sink of three links
        assert out[0]["importance"] >= out[1]["importance"]


class TestShardRouting:
    def test_conservation_and_determinism(self, spark):
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma " * (1 + i % 4)) for i in range(200)],
            "doc_id long, text string",
        )
        from tokenkit_spark.index.routing import shard_routing_audit

        out = shard_routing_audit(docs, n_shards=8).collect()
        assert len(out) <= 8
        assert sum(r["n_docs"] for r in out) == 200
        assert sum(r["n_tokens"] for r in out) == sum(
            3 * (1 + i % 4) for i in range(200)
        )
        assert sum(r["doc_share"] for r in out) == pytest.approx(1.0, abs=1e-3)
        # load factors average to ~1 when all shards hit
        if len(out) == 8:
            assert sum(r["doc_load"] for r in out) == pytest.approx(
                8.0, rel=1e-3
            )
        # same input -> identical routing (keyed md5, not a seeded rng)
        again = shard_routing_audit(docs, n_shards=8).collect()
        assert out == again

    def test_salt_changes_routing(self, spark):
        from tokenkit_spark.index.routing import route_shard_col
        from pyspark.sql import functions as F

        docs = spark.range(100).withColumnRenamed("id", "doc_id")
        a = docs.select(route_shard_col("doc_id", 16, "route").alias("s"))
        b = docs.select(route_shard_col("doc_id", 16, "other").alias("s"))
        assert a.collect() != b.collect()
        assert a.agg(F.min("s"), F.max("s")).first() != (None, None)


class TestCharEntropy:
    def test_matches_python_entropy(self, spark):
        texts = [
            (0, "hello world"),
            (1, "aaaaaaaaaa"),
            (2, "abcdefghij"),
        ]
        from tokenkit_spark.ops.textstats import char_entropy

        got = {
            r["doc_id"]: r
            for r in char_entropy(
                spark.createDataFrame(texts, "doc_id long, text string")
            ).collect()
        }
        for doc_id, text in texts:
            counts = {}
            for ch in text:
                counts[ch] = counts.get(ch, 0) + 1
            n = len(text)
            want = -sum(c / n * math.log2(c / n) for c in counts.values())
            r = got[doc_id]
            assert r["n_chars"] == n
            assert r["n_unique_chars"] == len(counts)
            assert r["entropy_bits"] == pytest.approx(want, abs=1e-4)
        assert got[1]["entropy_bits"] == 0.0 and got[1]["is_low_entropy"]
        assert not got[2]["is_low_entropy"]  # log2(10) ~ 3.32 > 3.0


class TestNgramContainment:
    def test_subset_detected_where_jaccard_misses(self, spark):
        short = "the quick brown fox jumps"
        long = short + " " + " ".join(f"filler{i}" for i in range(40))
        docs = spark.createDataFrame(
            [(0, short), (1, long)], "doc_id long, text string"
        )
        from tokenkit_spark.ops.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        pairs = ngram_containment_pairs(docs, threshold=0.9).collect()
        assert len(pairs) == 1
        p = pairs[0]
        assert (p["doc_id_a"], p["doc_id_b"]) == (0, 1)
        # every trigram of the short doc appears in the long one
        assert p["containment_a"] == pytest.approx(1.0)
        assert p["containment_b"] < 0.2
        # Jaccard at the same bar finds nothing: union is filler-dominated
        assert ngram_jaccard_pairs(docs, threshold=0.9).count() == 0

    def test_head_gram_cap_still_applies(self, spark):
        # 30 docs sharing one boilerplate trigram, otherwise disjoint
        docs = spark.createDataFrame(
            [(i, f"common boiler plate u{i} v{i} w{i}") for i in range(30)],
            "doc_id long, text string",
        )
        from tokenkit_spark.ops.dedup import ngram_containment_pairs

        capped = ngram_containment_pairs(
            docs, threshold=0.01, max_gram_df=10
        )
        # the df-30 boilerplate grams are stripped -> no shared grams left
        assert capped.count() == 0
        uncapped = ngram_containment_pairs(
            docs, threshold=0.01, max_gram_df=None
        )
        assert uncapped.count() == 30 * 29 // 2
