"""k-core decomposition (fixed-k peeling) on the web link graph.

Seidman, "Network structure and minimum degree" (Social Networks
1983): the k-core is the maximal subgraph in which every node has
degree >= k.  On crawl graphs the dense core separates genuine hub
communities from sparsely-linked spray pages and is the standard
prefilter for link-spam and seed-set mining (Alvarez-Hamelin et al.,
NIPS 2005 use it as a visual/structural fingerprint of the web).

Algorithm: synchronous peeling.  Round r removes every node whose
degree WITHIN the surviving subgraph is < k; peeling is monotone
(survivor sets only shrink) and idempotent at the fixpoint, so running
a fixed ``rounds`` budget is exact whenever the fixpoint is reached
earlier — extra rounds are no-ops.  The fixed budget is what makes the
recurrence SQL-unrollable (each round = one CTE level), the same
determinism contract as LPA/PageRank here (``ops/communities.py``).

Scale shape: each round is one semi-join of the undirected edge list
against the survivor set on BOTH endpoints plus one degree hash-agg —
key-partitioned shuffles only, map-side partial counts absorb hub
skew; the survivor vector (one row per live node) is
``localCheckpoint``-ed per round so lineage stays linear in rounds.
At web scale convergence for small k takes O(tens) of rounds; the
rounds budget is a parameter, and a production run would iterate
``while removed > 0`` with the same per-round plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.ops.communities import undirected_edges


def kcore_nodes(edges: DataFrame, k: int = 3, rounds: int = 8) -> DataFrame:
    """(node, degree) for every node surviving ``rounds`` synchronous
    peel rounds of the k-core computation over the undirected closure
    of ``edges`` (src, dst); ``degree`` is the within-core degree after
    the final round."""
    und = undirected_edges(edges)
    alive = und.select(F.col("src").alias("node")).distinct()
    for _ in range(rounds):
        live_edges = und.join(
            alive.withColumnRenamed("node", "src"), "src"
        ).join(alive.withColumnRenamed("node", "dst"), "dst")
        deg = live_edges.groupBy("src").agg(F.count("*").alias("degree"))
        alive = (
            deg.filter(F.col("degree") >= k)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=False)
        )
    live_edges = und.join(
        alive.withColumnRenamed("node", "src"), "src"
    ).join(alive.withColumnRenamed("node", "dst"), "dst")
    return (
        live_edges.groupBy("src")
        .agg(F.count("*").alias("degree"))
        .select(F.col("src").alias("node"), "degree")
    )


def kcore_audit(
    edges: DataFrame, k: int = 3, rounds: int = 8, top: int = 25
) -> DataFrame:
    """Top-``top`` k-core members by (within-core degree desc, node
    asc) with rank — the deterministic registry/oracle surface."""
    core = kcore_nodes(edges, k=k, rounds=rounds)
    w = Window.orderBy(F.col("degree").desc(), F.col("node").asc())
    return (
        core.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("rank", "node", "degree")
    )
