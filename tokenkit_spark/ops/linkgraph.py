"""Link-graph analytics over a crawl: PageRank (Page et al. 1999) and
the in-link/anchor rollups a web index feeds on.

Spark-first shape: the graph lives as an ``edges(src, dst)`` DataFrame;
each PageRank iteration is one equi-join (edges x current ranks, hash-
partitioned on the join key) + one hash aggregate on ``dst`` — the
classic two-shuffle-per-iteration plan. Out-degrees are computed ONCE
and cached into the edge list so iterations never recount. Dangling
mass (nodes with no out-links) is redistributed uniformly each
iteration, per the original formulation, via one scalar aggregate.

At 100 TB the knobs that matter: pre-partition ``edges`` by ``src``
(`repartition` or bucketing) so every iteration's join reuses the same
exchange; checkpoint ranks every ~5 iterations to cut lineage; AQE
handles the skew of mega-in-degree hubs. Fixed iteration counts (vs
convergence checks) keep the plan static and the oracle unrollable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    round_digits: int | None = None,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution:

        pr[v] = (1-d)/N + d * (sum_{u->v} pr[u]/deg(u) + dangling/N)

    run for a FIXED ``n_iter`` iterations from the uniform vector.
    Returns (node, pr). Deterministic, so a SQL oracle can unroll the
    same recurrence level by level."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # scalar graph size: drives the teleport constant
    degs = out_degrees(edges)
    contrib_edges = edges.join(degs, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(n_iter):
        # dangling mass: rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(degs, ranks["node"] == degs["src"], "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
            .first()["dm"]
        )
        inflow = (
            contrib_edges.join(ranks, contrib_edges["src"] == ranks["node"])
            .select("dst", (F.col("w") * F.col("pr")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("pr"),
            )
        )
    if round_digits is not None:
        ranks = ranks.select("node", F.round("pr", round_digits).alias("pr"))
    return ranks


def top_pagerank(
    edges: DataFrame, k: int = 20, n_iter: int = 5, damping: float = 0.85,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k nodes by PageRank (rounded desc, node asc) with rank."""
    pr = pagerank(edges, n_iter, damping, round_digits)
    top = pr.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(k)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), "node", "pr"
    )


def inlink_stats(edges: DataFrame, k: int = 20) -> DataFrame:
    """In-link counts + distinct linking hosts per target — the
    authority signal a ranker consumes directly. One hash agg."""
    return (
        edges.groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("n_inlinks"),
            F.countDistinct("src").alias("n_sources"),
        )
        .orderBy(F.col("n_inlinks").desc(), F.col("dst").asc())
        .limit(k)
    )
