"""Connected components over near-duplicate pair graphs + dedup-cluster
representative selection — the step AFTER pair generation in every
production dedup pipeline (MinHash/SimHash/Jaccard emit PAIRS; training
-set construction needs CLUSTERS, then one kept representative each).

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond", SoCC) — the standard
shuffle-bounded formulation:

- large-star: for every node u, attach all strictly-LARGER neighbours
  of u to the minimum of u's closed neighbourhood;
- small-star: for every node u (oriented so u is the larger endpoint),
  attach u and all its smaller neighbours to the minimum of that set.

Both steps are one groupBy-shuffle each, never materialize a
neighbourhood list wider than the groupBy machinery handles (partial
min-aggregation flattens high-degree hubs), and the edge count never
grows beyond the input. Converges in O(log n) rounds even on path
graphs — dedup clusters (near-cliques from banding) converge in 2-3.

Scale notes for the 100-TB regime:
- every round is exactly two shuffles (the groupBy-min and the dedup of
  emitted edges); no explode of neighbourhood arrays, no driver state
  beyond one convergence counter per round;
- ``localCheckpoint`` truncates the lineage every round so the plan
  doesn't deepen linearly with iterations (the classic iterative-Spark
  OOM trap);
- the convergence check is a count on the changed-edge set, computed on
  the same shuffled data the next round needs anyway.

Reference context: scientist-labs/tokenkit has no graph step (it is a
tokenization library); this implements the companion operator its
pipeline positioning (README.md corpus-dedup framing) requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Undirected view: both orientations, self-loops dropped."""
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbour v > u, m = min over u's closed
    neighbourhood. One groupBy shuffle; min is partially aggregated."""
    sym = _sym(edges)
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large->small, then for every u attach u and all
    its smaller neighbours to the minimum of that set."""
    oriented = _sym(edges).filter(F.col("u") > F.col("v"))
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    with_m = oriented.join(m, "u")
    pairs = with_m.select(
        F.col("v").alias("src"), F.col("m").alias("dst")
    ).unionByName(m.select(F.col("u").alias("src"), F.col("m").alias("dst")))
    return pairs.filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``
    (src/dst long columns); ``component`` is the minimum node id of the
    connected component. Alternating large-star/small-star until the
    edge set is a stable set of min-rooted stars.

    Nodes with no edges are the caller's concern (they are their own
    singleton components and never appear here)."""
    cur = (
        _sym(edges)
        .filter(F.col("u") > F.col("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        ls = _large_star(cur)
        nxt = _small_star(ls).localCheckpoint()
        # converged when every edge already points at the component min:
        # large-star emits nothing new and small-star reproduces cur.
        changed = (
            nxt.unionByName(cur)
            .groupBy("src", "dst")
            .count()
            .filter(F.col("count") == 1)
            .limit(1)
            .count()
        )
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds"
        )
    # stable star edges: (node, root). Roots are members of their own
    # component too.
    roots = cur.select(F.col("dst").alias("node")).distinct()
    return (
        cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .unionByName(roots.select("node", F.col("node").alias("component")))
        .distinct()
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, component, is_representative) for EVERY doc: near-dup
    clusters from ``pairs`` (src/dst), singleton docs as their own
    component, and the kept representative = min doc_id per component
    (the deterministic keep-first policy of C4/RefinedWeb-style dedup).
    """
    comp = connected_components(
        pairs.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
        .withColumn(
            "is_representative", (F.col("doc_id") == F.col("component"))
        )
    )
