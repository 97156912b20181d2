"""k-truss decomposition (fixed-round edge peeling) on the web link
graph — the edge-level sibling of the k-core (``ops/kcore.py``).

Cohen, "Trusses: cohesive subgraphs for social network analysis"
(NSA technical report, 2008): the k-truss is the maximal subgraph in
which every edge participates in at least k-2 triangles *within the
subgraph*. Where the k-core certifies node degrees, the truss
certifies that every remaining link is embedded in mutually-reinforcing
triangles — the standard community-backbone / link-farm filter on
crawl graphs (Wang & Cheng, VLDB 2012 give the canonical decomposition
algorithm this peeling schedule mirrors).

Algorithm: synchronous support peeling. Each round computes per-edge
triangle support over the SURVIVING edge set with the ordered-wedge
triangle enumeration (Suri & Vassilvitskii, WWW 2011 — the same
low->high orientation as ``linkgraph.py:triangle_counts``, so each
triangle is materialized exactly once), then drops every edge whose
support is < k-2. Peeling is monotone (survivor sets only shrink) and
idempotent at the fixpoint, so a fixed ``rounds`` budget is exact
whenever the fixpoint is reached earlier — extra rounds are no-ops.
The fixed budget keeps the recurrence SQL-unrollable (one CTE level
per round), the determinism contract shared with k-core/LPA/PageRank.

Scale shape: each round is two self-equi-joins of the oriented edge
list (wedge build + closure probe) plus one hash aggregate — all
key-partitioned shuffles; the low->high orientation biases the wedge
fan-out toward low-degree endpoints, which is exactly the paper's fix
for hub skew. Survivor edges are ``localCheckpoint``-ed per round so
lineage stays linear in rounds. At web scale the triangle join is the
dominant cost; a production run would additionally bucket the edge
list by its low endpoint so every round reuses one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Each undirected link once, low->high, self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _support(live: DataFrame) -> DataFrame:
    """(a, b, support): triangles through each surviving edge. Edges in
    no triangle are absent (join back with coalesce 0)."""
    e1 = live.select(F.col("a").alias("i"), F.col("b").alias("j"))
    e2 = live.select(F.col("a").alias("j"), F.col("b").alias("k"))
    e3 = live.select(F.col("a").alias("i"), F.col("b").alias("k"))
    tris = e1.join(e2, "j").join(e3, ["i", "k"])
    per_edge = (
        tris.select(F.col("i").alias("a"), F.col("j").alias("b"))
        .unionAll(tris.select(F.col("j").alias("a"), F.col("k").alias("b")))
        .unionAll(tris.select(F.col("i").alias("a"), F.col("k").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return per_edge


def ktruss_edges(edges: DataFrame, k: int = 3, rounds: int = 6) -> DataFrame:
    """(a, b, support) for every edge surviving ``rounds`` synchronous
    peel rounds of the k-truss computation over the low->high oriented
    closure of ``edges`` (src, dst); ``support`` is the within-truss
    triangle count after the final round."""
    live = _oriented(edges)
    for _ in range(rounds):
        sup = _support(live)
        live = (
            live.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    return live.join(_support(live), ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support")
    )


def ktruss_audit(
    edges: DataFrame, k: int = 3, rounds: int = 6, top: int = 25
) -> DataFrame:
    """Top-``top`` k-truss edges by (support desc, a asc, b asc) with
    rank — the deterministic registry/oracle surface."""
    truss = ktruss_edges(edges, k=k, rounds=rounds)
    w = Window.orderBy(
        F.col("support").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return (
        truss.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("rank", "a", "b", "support")
    )
