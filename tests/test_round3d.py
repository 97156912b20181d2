"""Session-H batch 2: CORI shard selection, impact-quantized SAAT,
NewPFD codec audit."""

import math

import pytest
from pyspark.sql import functions as F


class TestCori:
    def test_belief_math_and_routing_sensitivity(self, spark):
        # 2 shards worth of docs won't be even, but the formula is
        # verifiable per shard from the same routed stats
        docs = spark.createDataFrame(
            [(i, "alpha beta" if i % 3 else "gamma delta") for i in range(60)],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "alpha"), (1, "gamma"), (2, "zzz_absent")],
            "query_id long, text string",
        )
        from tokenkit_spark.index.cori import (
            cori_shard_scores,
            shard_term_stats,
        )

        n_shards = 4
        out = cori_shard_scores(docs, queries, n_shards=n_shards).collect()
        # every query ranks every populated shard exactly once
        df_ts, cw = shard_term_stats(docs, n_shards)
        shards = {r["shard"] for r in cw.collect()}
        for qid in (0, 1, 2):
            rows = [r for r in out if r["query_id"] == qid]
            assert {r["shard"] for r in rows} == shards
            assert sorted(r["rank"] for r in rows) == list(
                range(1, len(shards) + 1)
            )
        # absent term -> default belief b=0.4 on every shard
        for r in out:
            if r["query_id"] == 2:
                assert r["cori_score"] == pytest.approx(0.4)
        # hand-check one (term, shard) belief for query 0
        stats = {(r["shard"], r["term"]): r["df"] for r in df_ts.collect()}
        cws = {r["shard"]: r["cw"] for r in cw.collect()}
        avg_cw = sum(cws.values()) / len(cws)
        cf = sum(1 for (s, t) in stats if t == "alpha")
        got = {r["shard"]: r["cori_score"] for r in out if r["query_id"] == 0}
        for s in shards:
            df = stats.get((s, "alpha"), 0)
            t_part = (
                df / (df + 50 + 150 * cws[s] / avg_cw) if df else 0.0
            )
            i_part = math.log((len(shards) + 0.5) / cf) / math.log(
                len(shards) + 1.0
            )
            want = 0.4 + 0.6 * t_part * i_part
            assert got[s] == pytest.approx(want, abs=1e-6)


class TestImpactSaat:
    def test_quantization_bounds_and_monotonicity(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "rare common common"),
                (1, "common common common common"),
                (2, "rare rare common"),
                (3, "other words here common"),
            ],
            "doc_id long, text string",
        )
        from tokenkit_spark.index.impact import impact_postings

        rows = impact_postings(docs).collect()
        assert all(0 <= r["q_impact"] <= 255 for r in rows)
        # max impact quantizes to the top bucket, min to the bottom
        by_imp = sorted(rows, key=lambda r: r["impact"])
        assert by_imp[0]["q_impact"] == 0
        assert by_imp[-1]["q_impact"] == 255
        # quantization is monotone in impact
        for a, b in zip(by_imp, by_imp[1:]):
            assert a["q_impact"] <= b["q_impact"]

    def test_saat_ranks_match_exact_bm25_on_separated_corpus(self, spark):
        # scores far apart -> 8-bit quantization cannot flip the order
        docs = spark.createDataFrame(
            [
                (0, "target target target target pad1 pad2"),
                (1, "target pad3 pad4 pad5 pad6 pad7"),
                (2, "pad8 pad9 pada padb padc padd"),
            ],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "target")], "query_id long, text string"
        )
        from tokenkit_spark.index.impact import saat_top_k

        out = saat_top_k(docs, queries, k=10).collect()
        assert [r["doc_id"] for r in out] == [0, 1]  # doc 2 never matches
        assert out[0]["impact_score"] > out[1]["impact_score"]


class TestPfor:
    def test_size_model_hand_check(self, spark):
        # one term, 5 docs: ids 0,1,2,3,1000 -> gaps 0,1,1,1,997
        postings = spark.createDataFrame(
            [("t", i) for i in (0, 1, 2, 3, 1000)],
            "term string, doc_id long",
        )
        from tokenkit_spark.index.pfor import pfor_term_sizes

        r = pfor_term_sizes(postings).collect()[0]
        assert r["n_docs"] == 5 and r["n_blocks"] == 1
        # sorted gaps [0,1,1,1,997]; p90 index floor(.9*4)=3 -> gap 1
        # -> b=1 bit; exceptions: gaps >= 2 -> just 997
        assert r["n_exceptions"] == 1
        # bits = 32 header + 5*1 + 32*1 = 69 -> ceil/8 = 9 bytes
        assert r["pfor_bytes"] == 9
        # varint: gaps 0,1,1,1 -> 1 byte each; 997 -> 2 bytes
        assert r["varint_bytes"] == 6

    def test_dense_list_beats_varint(self, spark):
        # 300 consecutive ids: NewPFD packs 1-bit gaps, varint pays 8 bits
        postings = spark.createDataFrame(
            [("t", i) for i in range(300)], "term string, doc_id long"
        )
        from tokenkit_spark.index.pfor import pfor_audit

        r = pfor_audit(postings, k=1).collect()[0]
        assert r["n_blocks"] == 3
        assert r["n_exceptions"] == 0
        assert r["pfor_bytes"] < r["varint_bytes"]
