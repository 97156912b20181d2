"""k-truss peeling (ops/ktruss.py), Golomb-Rice codec audit
(index/rice.py), KMV distinct sketch (ops/kmv.py), Boldi-Vigna
webgraph compression audit (ops/bvgraph.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops.ktruss import ktruss_audit, ktruss_edges
from tokenkit_spark.ops.kmv import kmv_audit
from tokenkit_spark.ops.bvgraph import bv_graph_audit
from tokenkit_spark.index.rice import rice_audit


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------- k-truss


def test_ktruss_keeps_clique_drops_tail(spark):
    # K4 on {0,1,2,3}: every edge in 2 triangles -> survives k=4.
    # Pendant edge (3,9) and path (9,10): no triangles -> peeled at k=3.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = _edges(spark, k4 + [(3, 9), (9, 10)])
    out = ktruss_edges(e, k=4, rounds=4).collect()
    assert sorted((r.a, r.b) for r in out) == sorted(k4)
    assert all(r.support == 2 for r in out)


def test_ktruss_peeling_cascades(spark):
    # Triangle {0,1,2} plus a dangling path 2-3, 3-4: edges (2,3) and
    # (3,4) have support 0 -> removed round 1; triangle survives k=3.
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    out = ktruss_edges(e, k=3, rounds=3).collect()
    assert sorted((r.a, r.b) for r in out) == [(0, 1), (0, 2), (1, 2)]


def test_ktruss_k4_destroys_single_triangle(spark):
    # One triangle: each edge has support 1 < 2 -> 4-truss empty.
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    assert ktruss_edges(e, k=4, rounds=2).count() == 0


def test_ktruss_fixed_budget_is_fixpoint_stable(spark):
    # Chain of triangles sharing edges: extra rounds are no-ops once
    # the fixpoint is reached (monotone peeling).
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)]
    e = _edges(spark, pairs)
    r3 = sorted(map(tuple, ktruss_edges(e, k=3, rounds=3).collect()))
    r6 = sorted(map(tuple, ktruss_edges(e, k=3, rounds=6).collect()))
    assert r3 == r6


def test_ktruss_audit_rank_order(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = ktruss_audit(_edges(spark, k4), k=3, rounds=2, top=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert (out[0].a, out[0].b) == (0, 1)  # ties break (a, b) asc


# ------------------------------------------------------------ Golomb-Rice


def _postings(spark, rows):
    return spark.createDataFrame(rows, "term string, doc_id long")


def test_rice_param_and_lengths_hand_case(spark):
    # universe N = max id + 1 = 8; term "t": df 4 -> mean gap 2,
    # 0.69*2 = 1.38 -> b = 0. ids 1,3,5,7 -> gaps 1,2,2,2:
    # rice bits at b=0: (g>>0)+1 = 2,3,3,3 = 11; varint 4 bytes = 32.
    rows = [("t", 1), ("t", 3), ("t", 5), ("t", 7), ("u", 7)]
    out = {r.term: r for r in rice_audit(_postings(spark, rows)).collect()}
    t = out["t"]
    assert t.rice_b == 0 and t.rice_bits == 11 and t.varint_bits == 32
    # term "u": df 1 -> mean gap 8, 0.69*8 = 5.52 -> b = 2;
    # single gap 7: (7>>2)+1+2 = 4 bits.
    u = out["u"]
    assert u.rice_b == 2 and u.rice_bits == 4


def test_rice_beats_varint_on_dense_lists(spark):
    # Dense list (gap ~1): Rice ~2 bits/posting vs varint 8.
    rows = [("d", i) for i in range(0, 200)]
    out = rice_audit(_postings(spark, rows)).collect()[0]
    assert out.ratio < 0.5
    assert out.bpp_rice < 4.0


# -------------------------------------------------------------------- KMV


def test_kmv_exact_below_k(spark):
    # 10 distinct ids < k=64 -> estimator falls back to exact.
    rows = [(i % 10, "a") for i in range(100)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = kmv_audit(ev, k=64).collect()[0]
    assert out.exact_distinct == 10
    assert out.kmv_estimate == pytest.approx(10.0)
    assert out.rel_err == 0.0


def test_kmv_estimate_within_bound(spark):
    # 2000 distinct ids, k=64: Beyer et al. bound ~1/sqrt(k-2) ~ 0.127;
    # allow 3x for one draw of the pinned hash.
    rows = [(i, "a") for i in range(2000)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = kmv_audit(ev, k=64).collect()[0]
    assert out.exact_distinct == 2000
    assert out.rel_err < 3.0 / math.sqrt(62)


def test_kmv_hash_is_pinned(spark):
    # The hash is the stated congruence — independent recomputation.
    rows = [(7, "a"), (11, "a")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    vals = sorted(
        r.r
        for r in ev.select(
            (
                (F.col("user_id") * 2654435761 + 12345) % 2147483647
                / float(1 << 31)
            ).alias("r")
        ).collect()
    )
    expect = sorted(
        ((u * 2654435761 + 12345) % 2147483647) / float(1 << 31)
        for u in (7, 11)
    )
    assert vals == pytest.approx(expect)


# ----------------------------------------------------------- Boldi-Vigna


def test_bv_identical_neighbor_lists_use_reference(spark):
    # Nodes 10 and 11 share the exact successor list {100,101,102}:
    # node 11's ref arm = 3 + |P|=3 + 0 residual bits = 6 bits,
    # vs no-ref arm = 1 + full zeta stream — reference must win.
    pairs = [(10, d) for d in (100, 101, 102)] + [
        (11, d) for d in (100, 101, 102)
    ]
    out = bv_graph_audit(_edges(spark, pairs), chunk_size=64).collect()[0]
    assert out.nodes == 2 and out.links == 6
    assert out.ref_nodes == 1
    assert out.bpl_bv < out.bpl_varint <= out.bpl_raw


def test_bv_chunk_boundary_blocks_reference(spark):
    # Same lists but the second node sits in the next 64-id chunk:
    # no reference crosses the seam -> ref_nodes == 0.
    pairs = [(10, d) for d in (100, 101, 102)] + [
        (70, d) for d in (100, 101, 102)
    ]
    out = bv_graph_audit(_edges(spark, pairs), chunk_size=64).collect()[0]
    assert out.ref_nodes == 0


def test_bv_zeta3_and_gamma_hand_check(spark):
    # Single node 0 -> successors {1, 2}. outdeg 2: gamma(2) = 3 bits.
    # No predecessor -> arm A = 1 flag bit
    #   + zeta3(nat2int(1-0)+1 = 3) = 4 bits   (bin(3)='11', lb=1)
    #   + zeta3(gap 2-1 = 1)       = 3 bits   (lb=0)
    # total = 3 + 1 + 4 + 3 = 11 bits.
    out = bv_graph_audit(_edges(spark, [(0, 1), (0, 2)])).collect()[0]
    assert out.bv_bits == 11


def test_bv_total_is_sum_of_parts(spark):
    # Audit totals must be internally consistent: raw = 32 * links and
    # varint >= 8 bits per link.
    pairs = [(i, (i * 7 + 1) % 50) for i in range(30)] + [
        (i, (i * 13 + 2) % 50) for i in range(30)
    ]
    out = bv_graph_audit(_edges(spark, pairs)).collect()[0]
    assert out.raw_bits == 32 * out.links
    assert out.varint_bits >= 8 * out.links
    assert 0 <= out.ref_nodes <= out.nodes
