"""Community detection on the web link graph: label propagation.

Raghavan, Albert & Kumara, "Near linear time algorithm to detect
community structures in large-scale networks" (Phys. Rev. E 2007
[LPA]).  Communities on the crawl's host/doc graph drive site-level
dedup, seed-list expansion, and spam-farm detection; LPA is the
standard web-scale choice because one iteration is a single
edge-to-label equi-join plus a hash aggregate — the PageRank shape —
with no modularity matrix and no global state.

Determinism (so a SQL oracle can unroll the recurrence): labels start
as the node id; updates are SYNCHRONOUS over undirected edges; each
node adopts the most frequent label among its neighbors, breaking
count ties toward the SMALLEST label; a fixed ``n_iter`` iterations
(the async, random-order variant of the paper converges faster but is
unreproducible by construction).

Scale shape: per iteration, one (node)-keyed join of the undirected
edge list with the current label vector and one (node, label) count
aggregate + argmax window — 3 shuffles, all key-partitioned; the
label vector is ``localCheckpoint``-ed per iteration to keep lineage
(and optimizer time) linear in ``n_iter``, same as PageRank/HITS here.
Hub-node skew lands in the count aggregate, which has map-side
partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Distinct symmetric closure of (src, dst), self-loops dropped."""
    e = edges.filter(F.col("src") != F.col("dst"))
    return (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def label_propagation(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """(node, label) after ``n_iter`` synchronous LPA rounds over the
    undirected closure of ``edges`` (src, dst)."""
    und = undirected_edges(edges)
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    pick = Window.partitionBy("node").orderBy(
        F.col("n").desc(), F.col("label").asc()
    )
    for _ in range(n_iter):
        nbr = und.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        counts = nbr.groupBy("node", "label").agg(F.count("*").alias("n"))
        labels = (
            counts.withColumn("__r", F.row_number().over(pick))
            .filter(F.col("__r") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels


def community_sizes(
    edges: DataFrame, n_iter: int = 4, k: int = 20
) -> DataFrame:
    """Top-k communities by size: (rank, community, size, min_node) —
    deterministic order (size desc, community asc)."""
    labels = label_propagation(edges, n_iter)
    sizes = labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").alias("size"), F.min("node").alias("min_node")
    )
    w = Window.orderBy(F.col("size").desc(), F.col("community").asc())
    return (
        sizes.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "community", "size", "min_node")
    )
