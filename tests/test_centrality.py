"""Centrality / neighborhood function (ops/centrality.py): exact BFS
distances on hand graphs, harmonic centrality values, ANF monotonicity,
and HyperBall-HLL parity with the exact neighborhood function."""

import pytest

from tokenkit_spark.ops.centrality import (
    anf_hops,
    bounded_distances,
    harmonic_centrality,
    hyperball_anf,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bounded_distances_path_graph(spark):
    # 0 -> 1 -> 2 -> 3 (plus a self loop and a dup edge to be cleaned)
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (1, 1), (0, 1)])
    d = {(r.src, r.dst): r.dist
         for r in bounded_distances(e, max_hops=3).collect()}
    assert d == {(0, 1): 1, (1, 2): 1, (2, 3): 1,
                 (0, 2): 2, (1, 3): 2, (0, 3): 3}


def test_bounded_distances_cycle_min_dist(spark):
    # triangle 0->1->2->0: dist(0,1)=1 even though a 2-hop 0->..->1
    # alternative does not exist; self-distances excluded
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    d = {(r.src, r.dst): r.dist
         for r in bounded_distances(e, max_hops=3).collect()}
    assert d[(0, 1)] == 1 and d[(0, 2)] == 2
    assert (0, 0) not in d and (1, 1) not in d


def test_harmonic_centrality_star(spark):
    # 1,2,3 all point at 0; 0 points at 1. H(0) = 3*1 = 3;
    # H(1) = 1 (from 0) + 1/2 (from 2 via 0) + 1/2 (from 3) = 2.0
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (0, 1)])
    out = {r.node: r for r in
           harmonic_centrality(e, max_hops=3, k=10).collect()}
    assert out[0].harmonic == pytest.approx(3.0)
    assert out[0].reached_by == 3
    assert out[1].harmonic == pytest.approx(2.0)


def test_anf_hops_monotone_and_exact(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    rows = anf_hops(e, max_hops=3).orderBy("hop").collect()
    pairs = [r.reachable_pairs for r in rows]
    assert pairs == [4, 8, 12]  # 4-cycle: each hop adds 4 pairs
    assert rows[0].avg_ball == pytest.approx(1.0)


def test_hyperball_matches_exact_anf(spark):
    # deterministic pseudo-random digraph on 120 nodes, 3 edges each
    pairs = [(v, (v * m + a) % 120) for v in range(120)
             for m, a in ((7, 1), (13, 5), (29, 11)) if v != (v * m + a) % 120]
    e = _edges(spark, pairs)
    exact = {r.hop: r.reachable_pairs
             for r in anf_hops(e, max_hops=3).collect()}
    est = {r.hop: r.est_pairs
           for r in hyperball_anf(e, max_hops=3, p=9).collect()}
    assert set(est) == {1, 2, 3}
    for h in (1, 2, 3):
        assert est[h] == pytest.approx(exact[h], rel=0.10)
    assert est[1] < est[2] < est[3]
