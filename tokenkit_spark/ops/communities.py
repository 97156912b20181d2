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


def modularity_q(
    edges: DataFrame, labels: DataFrame, round_digits: int = 6
) -> DataFrame:
    """Newman modularity of a community assignment (Newman & Girvan
    2004, Phys. Rev. E 69: Q = Σ_c [ e_c/m − (deg_c/2m)² ] over the
    undirected simple graph) — the standard quality score for the LPA
    labels above (a partition with Q near 0 is no better than random;
    web-graph host communities land ~0.4-0.7).

    Output, one row per community: (label, n_nodes, internal_edges,
    degree_sum, q_contrib), with q_contrib rounded; Σ q_contrib = Q.

    Relational shape: the directed closure relation joined to the
    label table at both endpoints (two key joins riding the same node
    key), two hash aggregates, one broadcast one-row globals — the
    exact same plan family as one PageRank round; no iteration here."""
    und = undirected_edges(edges)
    lab = labels.select(
        F.col("node").alias("__n"), F.col("label").alias("__l")
    )
    both = (
        und.join(lab.withColumnRenamed("__n", "src")
                    .withColumnRenamed("__l", "l_src"), "src")
        .join(lab.withColumnRenamed("__n", "dst")
                 .withColumnRenamed("__l", "l_dst"), "dst")
    )
    m2 = und.agg(F.count(F.lit(1)).alias("m2"))  # 2m directed pairs
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    per = (
        both.filter(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("label"))
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("internal_edges"))
    )
    degc = (
        lab.join(deg, lab["__n"] == deg["src"])
        .groupBy(F.col("__l").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").cast("long").alias("degree_sum"),
        )
    )
    return (
        degc.join(per, "label", "left")
        .withColumn("internal_edges",
                    F.coalesce("internal_edges", F.lit(0)))
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            "n_nodes",
            "internal_edges",
            "degree_sum",
            F.round(
                F.col("internal_edges") / (F.col("m2") / 2)
                - F.pow(F.col("degree_sum") / F.col("m2"), 2),
                round_digits,
            ).alias("q_contrib"),
        )
    )
