"""Graph centrality and neighborhood functions over the web link graph:
bounded-hop BFS distances, harmonic centrality, and the ANF/HyperBall
neighborhood function.

* ``bounded_distances``   — exact shortest-path distances up to
                            ``max_hops`` via iterated frontier joins
                            (BFS order guarantees first-found = min).
* ``harmonic_centrality`` — Boldi & Vigna, "Axioms for Centrality"
                            (Internet Mathematics 2014): H(v) =
                            sum over u reaching v of 1/d(u, v), the
                            centrality they show satisfies all axioms
                            (unlike closeness, it handles unreachable
                            pairs by the natural 1/inf = 0).
* ``anf_hops``            — the neighborhood function N(h) = #{(u,v):
                            d(u,v) <= h} (Palmer, Gibbons & Faloutsos,
                            "ANF: A Fast and Scalable Tool for Data
                            Mining in Massive Graphs", KDD 2002).
* ``hyperball_anf``       — HyperBall (Boldi & Vigna, "In-Core
                            Computation of Geometric Centralities with
                            HyperBall", ICDMW 2013): per-node HLL
                            counters max-merged along edges each hop.

Scale shape: the exact forms materialize the reachable-pair relation —
one shuffle join + anti-join per hop — which is the oracle-checkable
small/medium-graph path (reachable pairs explode on a 10^12-node web
graph; that blow-up is the entire reason HyperBall exists).
``hyperball_anf`` is the 100-TB path: state is (node, register, rho)
rows — at most 2^p rows per node regardless of graph size — and one hop
is edges ⋈ state followed by groupBy(node, register).max(rho), a pure
relational max-merge with no per-pair materialization. Registers use
xxhash64 (JVM-side), estimates are the standard HLL bias-corrected
harmonic mean with linear-counting small-range correction, computed as
Catalyst aggregates. No UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _clean_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def bounded_distances(edges: DataFrame, max_hops: int = 3) -> DataFrame:
    """(src, dst, dist) for every ordered pair with shortest-path
    distance <= ``max_hops`` (self-pairs excluded). BFS iteration:
    frontier expands one hop per round; anti-join against the known set
    keeps the first (= minimal) distance."""
    e = _clean_edges(edges)
    known = e.withColumn("dist", F.lit(1))
    frontier = known
    for hop in range(2, max_hops + 1):
        nxt = (
            frontier.alias("f")
            .join(e.alias("g"), F.col("f.dst") == F.col("g.src"))
            .select(
                F.col("f.src").alias("src"), F.col("g.dst").alias("dst")
            )
            .distinct()
            .join(known.select("src", "dst"), ["src", "dst"], "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        known = known.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return known.filter(F.col("src") != F.col("dst"))


def harmonic_centrality(
    edges: DataFrame,
    max_hops: int = 3,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` nodes by truncated harmonic centrality: H(v) = sum of
    1/d(u, v) over nodes u that reach v within ``max_hops`` (the
    incoming form of Boldi & Vigna §3.2; distances beyond the horizon
    contribute 0)."""
    d = bounded_distances(edges, max_hops)
    scored = d.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("reached_by"),
        F.round(F.sum(1.0 / F.col("dist")), round_digits).alias("harmonic"),
    )
    return scored.orderBy(
        F.desc("harmonic"), F.desc("reached_by"), F.asc("node")
    ).limit(k)


def anf_hops(
    edges: DataFrame, max_hops: int = 3, round_digits: int = 6
) -> DataFrame:
    """(hop, reachable_pairs, avg_ball) for hop = 1..``max_hops``:
    N(h) = #{(u,v) : 0 < d(u,v) <= h} and its per-node mean over the
    graph's node set — the exact neighborhood function of ANF/KDD02."""
    e = _clean_edges(edges)
    n_nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst")))
        .distinct()
        .count()
    )
    d = bounded_distances(edges, max_hops)
    hops = d.select(
        "src",
        "dst",
        F.explode(
            F.sequence(F.col("dist"), F.lit(max_hops))
        ).alias("hop"),
    )
    return (
        hops.groupBy("hop")
        .agg(F.count("*").alias("reachable_pairs"))
        .select(
            "hop",
            "reachable_pairs",
            F.round(
                F.col("reachable_pairs") / F.lit(float(n_nodes)),
                round_digits,
            ).alias("avg_ball"),
        )
        .orderBy("hop")
    )


def hyperball_anf(
    edges: DataFrame, max_hops: int = 3, p: int = 10
) -> DataFrame:
    """(hop, est_pairs) — HyperBall estimate of the neighborhood
    function using 2^``p`` HLL registers per node, kept as
    (node, reg, rho) rows and max-merged along reversed edges each hop
    (counter of v after hop h estimates |{u : d(v,u) <= h}|, the
    outgoing ball including v itself; est_pairs subtracts the n self
    pairs to align with ``anf_hops``). Pure Catalyst: the per-hop step
    is one join + one (node, reg) max aggregate."""
    e = _clean_edges(edges)
    m = 1 << p
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst")))
        .distinct()
    )
    n_nodes = nodes.count()
    h = F.xxhash64(F.col("member"))
    # low p bits pick the register; rho = leading-zero count of the
    # remaining 64-p bits + 1, computed from the bit length of the
    # shifted hash (nonneg via unsigned shift).
    reg = h.bitwiseAND(F.lit(m - 1).cast("long")).alias("reg")
    rest = F.shiftrightunsigned(h, p)
    rho = (
        F.lit(64 - p + 1)
        - F.when(rest > 0, F.floor(F.log2(rest.cast("double"))) + 1)
        .otherwise(F.lit(0))
    ).cast("int").alias("rho")
    state = nodes.select(
        F.col("node"), F.col("node").alias("member")
    ).select("node", reg, rho)

    alpha = 0.7213 / (1 + 1.079 / m)

    def estimate(st: DataFrame, hop: int) -> DataFrame:
        per_node = st.groupBy("node").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("present_mass"),
            F.count("*").alias("present"),
        )
        # absent registers contribute 2^0 = 1 to the harmonic sum and
        # count as zero-registers for linear counting
        zeros = F.lit(m) - F.col("present")
        raw = F.lit(alpha * m * m) / (
            F.col("present_mass") + zeros.cast("double")
        )
        lin = F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        ).otherwise(raw)
        return per_node.select(
            F.lit(hop).alias("hop"), lin.alias("ball")
        ).groupBy("hop").agg(
            (F.sum("ball") - F.lit(float(n_nodes))).alias("est_pairs")
        )

    out = None
    for hop in range(1, max_hops + 1):
        grown = (
            e.alias("g")
            .join(state.alias("s"), F.col("g.dst") == F.col("s.node"))
            .select(
                F.col("g.src").alias("node"), F.col("s.reg"), F.col("s.rho")
            )
        )
        state = (
            state.unionByName(grown)
            .groupBy("node", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=False)
        )
        est = estimate(state, hop)
        out = est if out is None else out.unionByName(est)
    return out.orderBy("hop")
