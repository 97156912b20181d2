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


def hits(
    edges: DataFrame,
    n_iter: int = 5,
    round_digits: int | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, "Authoritative Sources in a
    Hyperlinked Environment", JACM 1999): from the all-ones vectors,
    iterate

        auth[v] = Σ_{u→v} hub[u]        then L2-normalize
        hub[u]  = Σ_{u→v} auth[v]       then L2-normalize

    for a FIXED ``n_iter`` iterations (deterministic, so a SQL oracle
    can unroll the recurrence level by level, like pagerank's).
    Returns (node, hub, auth).

    Scale shape: each half-iteration is one equi-join of the edge list
    with the current score vector (hash-partitioned on the join key)
    plus one hash aggregate — the same two-shuffle plan as PageRank.
    The L2 norms stay IN the plan as one-row broadcast cross joins (no
    driver collect per iteration), and each score vector is
    ``localCheckpoint``-ed: every level of the recurrence references
    the previous one TWICE (once through its norm, once through its
    values), so a fully lazy chain duplicates subtrees 4^n_iter times —
    both the optimizer and the execution blow up exponentially.
    Materializing the (tiny: one row per node) vector per iteration
    keeps work linear in ``n_iter`` and truncates lineage, the standard
    iterative-algorithm shape on Spark."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.select("node", F.lit(1.0).alias("s"))
    auths = nodes.select("node", F.lit(1.0).alias("s"))
    for _ in range(n_iter):
        raw_a = (
            edges.join(hubs, edges["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("s").alias("r"))
        )
        auths = _l2_normalized(nodes, raw_a, "dst").localCheckpoint()
        raw_h = (
            edges.join(auths, edges["dst"] == auths["node"])
            .groupBy("src")
            .agg(F.sum("s").alias("r"))
        )
        hubs = _l2_normalized(nodes, raw_h, "src").localCheckpoint()
    out = nodes.join(
        hubs.select(F.col("node").alias("__hn"), F.col("s").alias("hub")),
        F.col("node") == F.col("__hn"),
    ).join(
        auths.select(F.col("node").alias("__an"), F.col("s").alias("auth")),
        F.col("node") == F.col("__an"),
    ).select("node", "hub", "auth")
    if round_digits is not None:
        out = out.select(
            "node",
            F.round("hub", round_digits).alias("hub"),
            F.round("auth", round_digits).alias("auth"),
        )
    return out


def _l2_normalized(nodes: DataFrame, raw: DataFrame, key: str) -> DataFrame:
    """(node, s): ``raw(key, r)`` left-joined onto all nodes (absent ->
    0) and divided by the L2 norm, which rides the plan as a one-row
    broadcast."""
    norm = raw.agg(F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("nrm"))
    return (
        nodes.join(raw, nodes["node"] == raw[key], "left")
        .crossJoin(F.broadcast(norm))
        .select(
            "node",
            (F.coalesce(F.col("r"), F.lit(0.0)) / F.col("nrm")).alias("s"),
        )
    )


def top_hits_nodes(
    edges: DataFrame, k: int = 20, n_iter: int = 5, round_digits: int = 6
) -> DataFrame:
    """Top-k nodes by authority (rounded desc, node asc) with both
    scores: (rank, node, auth, hub)."""
    h = hits(edges, n_iter, round_digits)
    top = h.orderBy(F.col("auth").desc(), F.col("node").asc()).limit(k)
    w = Window.orderBy(F.col("auth").desc(), F.col("node").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "node",
        "auth",
        "hub",
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    n_iter: int = 5,
    damping: float = 0.85,
    round_digits: int | None = None,
) -> DataFrame:
    """Personalized PageRank (the random-walk-with-restart variant of
    Page et al. 1999, as popularized for recommendation by Haveliwala,
    "Topic-Sensitive PageRank", WWW 2002): teleport mass goes to the
    ``seeds`` set (uniformly) instead of all nodes —

        pr[v] = (1-d)·tele[v] + d·(Σ_{u→v} pr[u]/deg(u) + dangling·tele[v])

    with tele[v] = 1/|seeds| for seed nodes, 0 elsewhere, run a FIXED
    ``n_iter`` iterations from the teleport vector. Scores concentrate
    around the seeds — "importance relative to THIS neighborhood".
    Same two-shuffle-per-iteration plan as pagerank; the seed list is a
    query-sized literal, never a driver collect."""
    if not seeds:
        raise ValueError("personalized_pagerank: seeds must be non-empty")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    tele = F.when(
        F.col("node").isin(list(seeds)), F.lit(1.0 / len(seeds))
    ).otherwise(F.lit(0.0))
    degs = out_degrees(edges)
    contrib_edges = edges.join(degs, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )
    ranks = nodes.select("node", tele.alias("pr"))
    for _ in range(n_iter):
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
        ranks = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            "node",
            (
                F.lit(1.0 - damping) * tele
                + F.lit(damping)
                * (
                    F.coalesce(F.col("inflow"), F.lit(0.0))
                    + F.lit(float(dangling)) * tele
                )
            ).alias("pr"),
        )
    if round_digits is not None:
        ranks = ranks.select("node", F.round("pr", round_digits).alias("pr"))
    return ranks


def weighted_pagerank(
    wedges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    round_digits: int | None = None,
) -> DataFrame:
    """PageRank over a WEIGHTED edge list ``(src, dst, weight)``:

        pr[v] = (1-d)/N + d · Σ_{u→v} pr[u] · w(u,v)/W(u)

    with W(u) the total out-weight of u (the TextRank recurrence,
    Mihalcea & Tarau EMNLP 2004 eq. 2). No dangling handling: callers
    pass graphs where every node has out-weight (e.g. symmetrized
    co-occurrence graphs); nodes appearing only as ``dst`` would leak
    mass, so they are excluded from the node set by construction here —
    the node set is ``src`` ∪ ``dst`` and symmetric graphs make them
    equal. Same two-shuffle-per-iteration plan as pagerank."""
    nodes = (
        wedges.select(F.col("src").alias("node"))
        .union(wedges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    outw = wedges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    contrib = wedges.join(outw, "src").select(
        "src", "dst", (F.col("weight") / F.col("w_out")).alias("w")
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(n_iter):
        inflow = (
            contrib.join(ranks, contrib["src"] == ranks["node"])
            .select("dst", (F.col("w") * F.col("pr")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("pr"),
        )
    if round_digits is not None:
        ranks = ranks.select("node", F.round("pr", round_digits).alias("pr"))
    return ranks


def triangle_counts(edges: DataFrame, k: int = 20) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over the UNDIRECTED version of the link graph — the standard
    community-density signal (and the canonical MapReduce graph
    benchmark; the ordered-wedge formulation below is Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW 2011).

    Shape that survives scale: direct every undirected edge low->high
    ONCE (`a < b`), so each triangle {i<j<k} is found exactly once as
    the wedge (i,j)+(j,k) closed by (i,k) — two self-equi-joins, no
    double counting, no post-hoc dedup, and the wedge join fans out on
    the LOW endpoint, which the low->high orientation biases toward
    low-degree vertices (the paper's fix for the high-degree-hub
    reducer). Top-k by (triangles desc, node asc).

    Returns (rank, node, degree, triangles, clustering) where
    clustering = 2*triangles / (degree*(degree-1)), 0 for degree < 2.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1 = und.select(F.col("a").alias("i"), F.col("b").alias("j"))
    e2 = und.select(F.col("a").alias("j"), F.col("b").alias("k"))
    e3 = und.select(F.col("a").alias("i"), F.col("b").alias("k"))
    tris = e1.join(e2, "j").join(e3, ["i", "k"])  # one row per triangle
    per_node = (
        tris.select(F.col("i").alias("node"))
        .unionAll(tris.select(F.col("j").alias("node")))
        .unionAll(tris.select(F.col("k").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("clustering"),
    )
    w = Window.orderBy(F.col("triangles").desc(), F.col("node").asc())
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "node", "degree", "triangles", "clustering")
    )


def resolve_pointer_chains(
    redirects: DataFrame, n_doublings: int = 4
) -> DataFrame:
    """Resolve redirect CHAINS (a->b, b->c, c->d ...) to their final
    targets by pointer doubling (Wyllie's list-ranking technique, the
    standard BSP/MapReduce shape): each round every pointer jumps to
    its target's target, so ``n_doublings`` rounds resolve chains up to
    length 2^n_doublings with only log(chain) self-joins — a naive walk
    would need one join PER HOP, and crawl redirect chains (www ->
    apex -> https -> canonical path -> CDN mirror) routinely run 5+
    hops over 10^9 URLs.

    Input (src, dst) single-step redirects; output (src, final) for
    every redirecting URL. Nodes on a redirect CYCLE never reach a
    fixpoint — after the fixed rounds they report whatever node the
    doubled walk lands on (deterministic for a given n_doublings; the
    SQL oracle unrolls the identical rounds). Each round is one
    self-equi-join hash-partitioned on the join key."""
    f = redirects.select("src", "dst")
    for _ in range(n_doublings):
        nxt = f.select(F.col("src").alias("__s2"), F.col("dst").alias("__d2"))
        f = (
            f.join(nxt, f["dst"] == F.col("__s2"), "left")
            .select(
                "src",
                F.coalesce(F.col("__d2"), F.col("dst")).alias("dst"),
            )
        )
    return f.withColumnRenamed("dst", "final")


def degree_distribution(edges: DataFrame, round_digits: int = 6) -> DataFrame:
    """Degree-distribution histogram of the directed link graph, both
    directions: for each (direction, degree) the node count and its
    share of that direction's node total — the first diagnostic of any
    webgraph (Broder et al. 2000 measure power-law in/out exponents
    from exactly this relation; a crawl whose in-degree tail is too
    heavy is hub/spam-dominated).

    Scale shape: two degree aggregates + two histogram aggregates —
    all map-side-combinable; output is degree-vocabulary-sized.
    Returns (direction, degree, n_nodes, share)."""
    out = []
    for direction, key in (("out", "src"), ("in", "dst")):
        deg = edges.groupBy(F.col(key).alias("node")).agg(
            F.count("*").alias("degree")
        )
        hist = deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))
        total = deg.select(F.countDistinct("node").alias("n_total"))
        out.append(
            hist.crossJoin(F.broadcast(total)).select(
                F.lit(direction).alias("direction"),
                "degree",
                "n_nodes",
                F.round(F.col("n_nodes") / F.col("n_total"), round_digits).alias(
                    "share"
                ),
            )
        )
    return out[0].unionByName(out[1]).orderBy("direction", "degree")


def opic_importance(
    edges: DataFrame, n_iter: int = 5, round_digits: int | None = None
) -> DataFrame:
    """On-line Page Importance Computation (Abiteboul, Preda & Cobena,
    "Adaptive on-line page importance computation", WWW 2003) — the
    crawl-prioritization alternative to PageRank: every page holds
    cash; each step a page distributes ALL its cash equally over its
    out-links (dangling pages pay the virtual page, which redistributes
    uniformly), and a page's importance estimate is the cash that has
    FLOWED THROUGH it — history plus current holdings, normalized.

    This is the synchronous batch variant: with cash_0 uniform,

        cash_{t+1}[v] = sum_{u->v} cash_t[u]/deg(u) + dangling_t/N
        importance[v] = (sum_{t=0..n} cash_t[v]) / (n+1)

    Total cash is invariant (=1), so after n iterations accumulated
    history is exactly n and the normalizer is a constant — the SQL
    oracle unrolls the same recurrence level by level and sums them.

    Scale shape: identical to PageRank's — one broadcast-or-shuffle
    join edges⋈cash + one groupBy(dst) per iteration; the only scalars
    on the driver are N and the dangling mass. No per-node state ever
    leaves the cluster. Returns (node, importance)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    degs = out_degrees(edges)
    contrib = edges.join(degs, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )
    cash = nodes.select("node", F.lit(1.0 / n).alias("cash"))
    acc = cash.select("node", F.col("cash").alias("hist"))
    for _ in range(n_iter):
        dangling = (
            cash.join(degs, cash["node"] == degs["src"], "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dm"))
            .first()["dm"]
        )
        inflow = (
            contrib.join(cash, contrib["src"] == cash["node"])
            .select("dst", (F.col("w") * F.col("cash")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        cash = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            "node",
            (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n)).alias(
                "cash"
            ),
        )
        acc = (
            acc.join(cash, "node")
            .select("node", (F.col("hist") + F.col("cash")).alias("hist"))
        )
    imp = acc.select(
        "node", (F.col("hist") / F.lit(float(n_iter + 1))).alias("importance")
    )
    if round_digits is not None:
        imp = imp.select(
            "node", F.round("importance", round_digits).alias("importance")
        )
    return imp


def top_opic(
    edges: DataFrame, k: int = 20, n_iter: int = 5, round_digits: int = 6
) -> DataFrame:
    """Top-k crawl-priority pages by OPIC importance (rounded desc,
    node asc) with rank — the fetch-next ordering an OPIC crawler
    consumes."""
    imp = opic_importance(edges, n_iter, round_digits)
    w = Window.orderBy(F.col("importance").desc(), F.col("node").asc())
    return (
        imp.orderBy(F.col("importance").desc(), F.col("node").asc())
        .limit(k)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "node",
            "importance",
        )
    )


def salsa_authorities(
    edges: DataFrame, n_iter: int = 4, round_digits: int | None = None
) -> DataFrame:
    """SALSA authority scores (Lempel & Moran, "The stochastic approach
    for link-structure analysis", WWW 2000): HITS's random-walk cousin —
    the authority chain steps BACKWARD along a uniformly random in-link
    then FORWARD along a uniformly random out-link of that hub, so the
    update is

        h(i)    = sum_{i->j} a_t(j) / indeg(j)
        a_{t+1}(k) = sum_{i->k} h(i) / outdeg(i)

    a doubly-stochastic two-step that conserves mass (no normalization
    pass needed, unlike HITS) and whose stationary weights famously
    resist the tightly-knit-community effect. Start uniform over
    authority nodes (indeg >= 1).

    Scale shape: per iteration exactly two edge-join + groupBy rounds —
    PageRank's plan, twice — with degree tables computed once. The SQL
    oracle unrolls h/a levels pairwise. Returns (node, salsa)."""
    indeg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    n_auth = indeg.count()
    a = indeg.select("node", F.lit(1.0 / n_auth).alias("a"))
    for _ in range(n_iter):
        # backward half-step: hub i aggregates a(j)/indeg(j) over i->j
        h = (
            edges.join(a, edges["dst"] == a["node"])
            .join(indeg.withColumnRenamed("node", "dst_n"),
                  F.col("dst") == F.col("dst_n"))
            .select("src", (F.col("a") / F.col("in_deg")).alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("h"))
        )
        # forward half-step: authority k aggregates h(i)/outdeg(i)
        a = (
            edges.join(h, "src")
            .join(outdeg.withColumnRenamed("node", "src_n"),
                  F.col("src") == F.col("src_n"))
            .select(
                F.col("dst").alias("node"),
                (F.col("h") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("a"))
        )
    if round_digits is not None:
        a = a.select("node", F.round("a", round_digits).alias("a"))
    return a.withColumnRenamed("a", "salsa")


def top_salsa(
    edges: DataFrame, k: int = 20, n_iter: int = 4, round_digits: int = 6
) -> DataFrame:
    """Top-k authorities by SALSA score (rounded desc, node asc)."""
    s = salsa_authorities(edges, n_iter, round_digits)
    w = Window.orderBy(F.col("salsa").desc(), F.col("node").asc())
    return (
        s.orderBy(F.col("salsa").desc(), F.col("node").asc())
        .limit(k)
        .select(
            F.row_number().over(w).cast("long").alias("rank"), "node", "salsa"
        )
    )


def spam_mass(
    edges: DataFrame,
    trusted_seeds: list,
    n_iter: int = 5,
    damping: float = 0.85,
    k: int = 25,
    round_digits: int = 6,
) -> DataFrame:
    """Spam mass (Gyongyi, Berkhin, Garcia-Molina & Pedersen, "Link
    spam detection based on mass estimation", VLDB 2006): the fraction
    of a page's PageRank that does NOT flow from a trusted core —

        mass(v) = (PR(v) - TR(v)) / PR(v)

    with TR the TrustRank vector (Gyongyi et al., VLDB 2004): PageRank
    whose teleport is pinned to the trusted seed set — exactly
    personalized_pagerank(seeds). Pages near 1.0 earn their rank from
    link neighborhoods unreachable-by-teleport from trust: the link-spam
    suspect list a crawl operator reviews first.

    Both vectors are the existing two-shuffle-per-iteration plans; the
    combination is one node-keyed join. PR and TR are rounded BEFORE
    the mass ratio so the engine and the unrolled SQL oracle agree
    bit-for-bit. Returns top-k by (mass desc, node asc):
    (rank, node, pr, trustrank, spam_mass)."""
    pr = pagerank(edges, n_iter, damping).select(
        "node", F.round("pr", round_digits).alias("pr")
    )
    tr = personalized_pagerank(edges, trusted_seeds, n_iter, damping).select(
        "node", F.round("pr", round_digits).alias("trustrank")
    )
    j = pr.join(tr, "node").select(
        "node",
        "pr",
        "trustrank",
        F.round(
            (F.col("pr") - F.col("trustrank")) / F.col("pr"), round_digits
        ).alias("spam_mass"),
    )
    w = Window.orderBy(F.col("spam_mass").desc(), F.col("node").asc())
    return (
        j.orderBy(F.col("spam_mass").desc(), F.col("node").asc())
        .limit(k)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "node",
            "pr",
            "trustrank",
            "spam_mass",
        )
    )


def _bfs_fixpoint(edges: DataFrame, seeds: DataFrame, src: str, dst: str,
                  max_iter: int) -> DataFrame:
    """Distributed BFS to fixpoint: reachable node set from ``seeds``
    following (src -> dst). One join + distinct per round with a
    driver-side convergence check (the GraphFrames/Pregel shape);
    ``max_iter`` is a runaway cap, not the semantic."""
    # localCheckpoint per round: BFS lineage otherwise compounds one
    # join+distinct per iteration and the final classification plan
    # blows the driver heap (the standard iterative-graph trap —
    # GraphFrames checkpoints for the same reason)
    reach = seeds.select("node").distinct().localCheckpoint()
    n = reach.count()
    for _ in range(max_iter):
        nxt = (
            reach.unionByName(
                edges.join(reach, edges[src] == reach["node"])
                .select(edges[dst].alias("node"))
            )
            .distinct()
            .localCheckpoint()
        )
        m = nxt.count()
        reach = nxt
        if m == n:
            break
        n = m
    return reach


def bowtie_decomposition(
    edges: DataFrame,
    max_iter: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Bowtie structure of a directed graph (Broder, Kumar, Maghoul,
    Raghavan, Rajagopalan, Stata, Tomkins & Wiener, "Graph structure
    in the Web", WWW 2000): pick the highest-degree node as the pivot
    into the giant SCC, then classify every node by reachability —

    * CORE: forward- AND backward-reachable from the pivot (its SCC),
    * IN: reaches the core but is not reached by it,
    * OUT: reached by the core but cannot reach it,
    * TENDRIL: weakly connected to the core but in none of the above
      (tendrils + tubes in the paper's finer split),
    * DISCONNECTED: not even weakly connected to the pivot.

    Exactly the paper's method (BFS from a core node in both
    directions plus an undirected sweep). Returns one row per
    component: (component, n_nodes, frac), ordered by component name.

    Scale shape: three BFS fixpoints (forward, backward, undirected),
    each one equi-join + distinct per round — the Pregel pattern; the
    classification is three anti-joins over the node relation. Degree
    pivot selection is one aggregate + limit 1."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    pivot = deg.orderBy(F.col("d").desc(), F.col("node").asc()).limit(1)

    fwd = _bfs_fixpoint(edges, pivot, "src", "dst", max_iter)
    bwd = _bfs_fixpoint(edges, pivot, "dst", "src", max_iter)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    und = _bfs_fixpoint(sym, pivot, "src", "dst", max_iter)

    all_nodes = nodes.distinct()
    core = fwd.join(bwd, "node")
    in_c = bwd.join(core, "node", "left_anti")
    out_c = fwd.join(core, "node", "left_anti")
    fb = fwd.unionByName(bwd).distinct()
    tendril = und.join(fb, "node", "left_anti")
    disc = all_nodes.join(und, "node", "left_anti")

    parts = [
        ("CORE", core), ("IN", in_c), ("OUT", out_c),
        ("TENDRIL", tendril), ("DISCONNECTED", disc),
    ]
    counts = None
    for name, df_part in parts:
        c = df_part.agg(F.count(F.lit(1)).alias("n_nodes")).select(
            F.lit(name).alias("component"), "n_nodes"
        )
        counts = c if counts is None else counts.unionByName(c)
    total = all_nodes.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "component",
            "n_nodes",
            F.round(F.col("n_nodes") / F.col("total"), round_digits)
            .alias("frac"),
        )
        .orderBy("component")
    )


def coupling_cocitation(
    edges: DataFrame,
    mode: str = "coupling",
    k: int = 20,
    max_df: int | None = 10_000,
    round_digits: int = 4,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963) / co-citation (Small
    1973) over the link graph — the two classic structural-similarity
    measures behind "related pages" and link-farm trawling (Kumar et
    al., WWW 1999: an (i,j) bipartite core surfaces as fan pairs with
    j shared centers):

    * coupling: pairs of PAGES scored by shared OUT-links,
    * cocitation: pairs of PAGES scored by shared IN-links,

    normalized by Jaccard over the respective link sets. Top-k pairs
    by (shared desc, a, b). ``max_df`` drops hub-side keys shared by
    more than that many nodes before the pair join (the boilerplate
    guard — a center with 10^6 fans creates 10^12 pairs).

    Scale shape: one distinct projection, a df-capped self-join keyed
    on the shared endpoint, one pair aggregate + two size joins — the
    mirror_pairs shape on the graph relation."""
    if mode == "coupling":
        rel = edges.select(F.col("src").alias("node"),
                           F.col("dst").alias("key")).distinct()
    elif mode == "cocitation":
        rel = edges.select(F.col("dst").alias("node"),
                           F.col("src").alias("key")).distinct()
    else:
        raise ValueError(f"unknown mode: {mode}")
    sizes = rel.groupBy("node").agg(F.count(F.lit(1)).alias("sz"))
    if max_df is not None:
        rare = (
            rel.groupBy("key").agg(F.count(F.lit(1)).alias("kdf"))
            .filter(F.col("kdf") <= max_df)
            .select("key")
        )
        rel = rel.join(rare, "key")
    a = rel.select(F.col("node").alias("a"), "key")
    b = rel.select(F.col("node").alias("b"), "key")
    pairs = (
        a.join(b, "key")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    scored = (
        pairs.join(sizes.select(F.col("node").alias("a"),
                                F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("node").alias("b"),
                           F.col("sz").alias("sz_b")), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("sz_a") + F.col("sz_b") - F.col("shared")),
                round_digits,
            ),
        )
    )
    w = Window.orderBy(F.col("shared").desc(), "a", "b")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "a", "b", "shared", "sz_a", "sz_b", "jaccard")
    )


def adamic_adar(
    edges: DataFrame,
    k: int = 20,
    max_degree: int | None = 256,
    round_digits: int = 6,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar, "Friends and
    neighbors on the Web", Social Networks 25(3), 2003; the strongest
    simple common-neighbor predictor in Liben-Nowell & Kleinberg's
    link-prediction study, CIKM 2003): a candidate pair (u, v) scores

        AA(u, v) = sum over common neighbors z of 1 / ln(deg(z))

    on the undirected, de-duplicated, self-loop-free graph — common
    neighbors weighted inversely by how promiscuous they are (a hub
    that links everyone says almost nothing about u~v affinity).

    Shape: wedge enumeration through the shared node z — one self-join
    of the z-keyed neighbor relation, the same quadratic-in-deg(z)
    fan-out as triangle counting, so ``max_degree`` drops hub
    intermediates before the join (the cap costs almost nothing
    semantically: a z above the cap contributes < 1/ln(cap) per pair,
    and is the standard wedge-cap mitigation at web scale; pass None
    for the exact score, which the DuckDB oracle twin mirrors). Joins
    shuffle on z then on the (u, v) pair key only. Existing edges are
    NOT excluded — callers ranking missing-link candidates anti-join
    ``edges`` themselves. Returns top-k (rank, src, dst, aa) by
    (aa desc at ``round_digits``, src asc, dst asc)."""
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("z")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    # neighbor relation keyed by the shared intermediate z (deg rides
    # along so the pair aggregate never re-joins the degree table)
    nbrs = und.select(F.col("src").alias("z"), F.col("dst").alias("nbr")).join(
        deg, "z"
    )
    pairs = nbrs.alias("a").join(
        nbrs.select(F.col("z").alias("z2"), F.col("nbr").alias("v")).alias("b"),
        (F.col("a.z") == F.col("b.z2")) & (F.col("a.nbr") < F.col("b.v")),
    )
    scored = pairs.groupBy(
        F.col("a.nbr").alias("src"), F.col("b.v").alias("dst")
    ).agg(F.round(F.sum(1.0 / F.log(F.col("a.deg"))), round_digits).alias("aa"))
    w = Window.orderBy(F.col("aa").desc(), F.col("src").asc(), F.col("dst").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "src", "dst", "aa")
    )


def simrank_pairs(
    edges: DataFrame,
    c: float = 0.8,
    iterations: int = 3,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Pruned SimRank over the directed link graph (Jeh & Widom,
    "SimRank: A Measure of Structural-Context Similarity", KDD 2002):

        s(a,a) = 1
        s(a,b) = C / (|I(a)||I(b)|) * sum_{i in I(a), j in I(b)} s(i,j)

    with I(x) the in-neighbor set.  State is restricted to the
    CO-CITED candidate pairs (a < b sharing >= 1 in-neighbor) — the
    standard pruning: any pair outside it has s = 0 at iteration 1,
    and treating it as 0 afterwards yields a monotone lower bound
    while keeping state linear in co-citation pairs instead of O(V^2)
    (the only shape that survives a web-scale graph; the candidate
    set is exactly the co_citation relation above).  Self-pairs are
    the constant 1 and never materialize.

    Each iteration is one join of the candidate-pair relation with
    the in-edge relation on both sides plus a lookup of the previous
    scores — the PageRank-shaped join+agg, with localCheckpoint
    cutting the lineage per round (the iterative-plan trap from
    SURVEY session E).

    Returns the top-``k`` pairs after ``iterations`` rounds:
    (rank, src, dst, simrank), ties (score desc at round_digits,
    src asc, dst asc).
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))

    # candidate pairs: a < b sharing an in-neighbor
    pairs = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst") < F.col("y.dst"))
        .select(
            F.col("x.dst").alias("a"), F.col("y.dst").alias("b")
        )
        .distinct()
    )
    # expanded support: (a, b, i, j) for i in I(a), j in I(b), with degs
    base = (
        pairs.join(e.select(F.col("dst").alias("a"), F.col("src").alias("i")), "a")
        .join(e.select(F.col("dst").alias("b"), F.col("src").alias("j")), "b")
        .join(indeg.select(F.col("dst").alias("a"), F.col("indeg").alias("na")), "a")
        .join(indeg.select(F.col("dst").alias("b"), F.col("indeg").alias("nb")), "b")
        .select(
            "a", "b", "na", "nb",
            F.least("i", "j").alias("pi"), F.greatest("i", "j").alias("pj"),
            (F.col("i") == F.col("j")).cast("double").alias("diag"),
        )
        .localCheckpoint()
    )

    s = None  # (a, b, s) — iteration-k scores over the candidate set
    for _ in range(iterations):
        if s is None:
            contrib = base.withColumn("s_prev", F.col("diag"))
        else:
            contrib = base.join(
                s.select(
                    F.col("a").alias("pi"), F.col("b").alias("pj"),
                    F.col("s").alias("s_pair"),
                ),
                ["pi", "pj"],
                "left",
            ).withColumn(
                "s_prev",
                F.when(F.col("diag") == 1.0, 1.0).otherwise(
                    F.coalesce(F.col("s_pair"), F.lit(0.0))
                ),
            )
        s = (
            contrib.groupBy("a", "b")
            .agg(
                (
                    F.lit(c)
                    * F.sum("s_prev")
                    / (F.first("na") * F.first("nb"))
                ).alias("s")
            )
            .localCheckpoint()
        )

    w = Window.orderBy(
        F.round("s", round_digits).desc(), F.col("a").asc(), F.col("b").asc()
    )
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            F.round("s", round_digits).alias("simrank"),
        )
    )


def top_katz(
    edges: DataFrame,
    n_iter: int = 5,
    alpha: float = 0.1,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Katz centrality (Katz, Psychometrika 1953) by fixed-point
    iteration x <- 1 + alpha * A^T x from x = 1 — the attenuated
    all-walks sibling of PageRank (no degree normalization, so hubs
    pointing anywhere still confer status; alpha below 1/lambda_max
    guarantees convergence, and the fixed ``n_iter`` truncation equals
    the paths-up-to-length-n_iter partial sum, SQL-unrollable level by
    level). Same two-shuffle-per-iteration plan as PageRank: one
    edge x scores equi-join + one hash aggregate per level.
    Returns (rank, node, katz) by (6-dp score desc, node asc)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    x = nodes.select("node", F.lit(1.0).alias("x"))
    for _ in range(n_iter):
        inflow = (
            edges.join(x, edges["src"] == x["node"])
            .select("dst", F.col("x").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        x = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            "node",
            (
                F.lit(1.0)
                + alpha * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("x"),
        ).localCheckpoint(eager=False)
    w = Window.orderBy(F.round(F.col("x"), round_digits).desc(),
                       F.col("node").asc())
    return (
        x.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "node", F.round("x", round_digits).alias("katz"))
    )


def degree_assortativity(
    edges: DataFrame, round_digits: int = 6
) -> DataFrame:
    """Degree assortativity coefficient (Newman, "Assortative mixing
    in networks", PRL 2002): the Pearson correlation of the degrees at
    the two ends of every undirected edge (both orientations counted,
    the standard convention). Positive r: hubs link to hubs (social
    nets); negative: hubs link to leaves (the web, biological nets).
    One degree hash-agg + one edge-keyed join + one scalar aggregate —
    a single pass at any scale. Returns one row (n_edges, mean_deg,
    assortativity)."""
    from tokenkit_spark.ops.communities import undirected_edges

    und = undirected_edges(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (
        und.join(deg.withColumnRenamed("src", "a_node"),
                 und["src"] == F.col("a_node"))
        .withColumnRenamed("deg", "dx")
        .join(deg.withColumnRenamed("src", "b_node"),
              und["dst"] == F.col("b_node"))
        .withColumnRenamed("deg", "dy")
        .select("dx", "dy")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    num = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m")
    den = F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m"))
        * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("m"))
    )
    return agg.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.round(F.col("sx") / F.col("m"), round_digits).alias("mean_deg"),
        F.round(num / den, round_digits).alias("assortativity"),
    )


def host_graph(
    edges: DataFrame,
    src_host,
    dst_host,
) -> DataFrame:
    """Roll a page-level link graph up to the host graph (the standard
    first reduction in web-graph analysis — Broder et al., "Graph
    structure in the web", WWW 2000 analyze both granularities):
    (src_host, dst_host, n_links) over inter-host edges only
    (intra-host links drop — they are navigation, not endorsement).
    One hash aggregate; the host graph is orders of magnitude smaller
    than the page graph, so every downstream centrality runs on the
    reduced relation."""
    return (
        edges.select(src_host.alias("src_host"), dst_host.alias("dst_host"))
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_graph_stats(hedges: DataFrame, round_digits: int = 6) -> DataFrame:
    """One summary row over a host graph (src_host, dst_host, n_links):
    (n_hosts, n_edges, n_reciprocal, reciprocity, avg_out_degree).
    Reciprocity = fraction of directed host pairs whose reverse edge
    also exists (Newman, "The structure and function of complex
    networks", SIAM Rev. 2003 §3.4) — for the web it separates
    mutual-link communities from one-way endorsement flows.  The
    reverse-edge check is one self-equi-join on the (dst, src) key —
    hash-partitioned, never quadratic."""
    e = hedges.select("src_host", "dst_host")
    rev = e.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
    )
    recip = e.join(rev, ["src_host", "dst_host"], "left_semi")
    hosts = e.select(F.col("src_host").alias("h")).unionByName(
        e.select(F.col("dst_host").alias("h"))
    ).distinct()
    stats = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(
            F.broadcast(hosts.agg(F.count(F.lit(1)).alias("n_hosts")))
        )
        .crossJoin(
            F.broadcast(
                recip.agg(F.count(F.lit(1)).alias("n_reciprocal"))
            )
        )
        .crossJoin(
            F.broadcast(
                e.groupBy("src_host")
                .agg(F.count(F.lit(1)).alias("od"))
                .agg(F.avg("od").alias("avg_od"))
            )
        )
        .select(
            "n_hosts",
            "n_edges",
            "n_reciprocal",
            F.round(
                F.col("n_reciprocal") / F.col("n_edges"), round_digits
            ).alias("reciprocity"),
            F.round("avg_od", round_digits).alias("avg_out_degree"),
        )
    )


def link_prediction_battery(
    edges: DataFrame,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """The full unsupervised link-prediction battery of Liben-Nowell &
    Kleinberg ("The link prediction problem for social networks", CIKM
    2003) on the undirected graph: for every two-hop candidate pair,

    * common neighbors   CN(u,v) = |N(u) ∩ N(v)|
    * Jaccard            CN / |N(u) ∪ N(v)|
    * Adamic-Adar        sum_z 1/ln(deg z)   (see adamic_adar above)
    * preferential attachment  deg(u) * deg(v)

    Shape: one wedge self-join keyed by the shared neighbor z (exact —
    no hub cap here, the oracle twin mirrors it), one (u,v) aggregate,
    one broadcast-sized degree join per endpoint.  Top-k by
    (cn desc, src, dst) so the four predictors can be compared on the
    same candidates.  Returns (rank, src, dst, cn, jaccard, aa, pa)."""
    und = (
        edges.select("src", "dst")
        .union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("n")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nbrs = und.select(F.col("src").alias("z"), F.col("dst").alias("nbr")).join(
        deg.select(F.col("n").alias("z"), F.col("deg").alias("zdeg")), "z"
    )
    pairs = nbrs.alias("a").join(
        nbrs.select(
            F.col("z").alias("z2"), F.col("nbr").alias("v")
        ).alias("b"),
        (F.col("a.z") == F.col("b.z2")) & (F.col("a.nbr") < F.col("b.v")),
    )
    scored = pairs.groupBy(
        F.col("a.nbr").alias("src"), F.col("b.v").alias("dst")
    ).agg(
        F.count(F.lit(1)).alias("cn"),
        F.round(F.sum(1.0 / F.log(F.col("a.zdeg"))), round_digits).alias(
            "aa"
        ),
    )
    du = deg.select(F.col("n").alias("src"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("dst"), F.col("deg").alias("dv"))
    full = (
        scored.join(du, "src")
        .join(dv, "dst")
        .select(
            "src",
            "dst",
            "cn",
            F.round(
                F.col("cn")
                / (F.col("du") + F.col("dv") - F.col("cn")),
                round_digits,
            ).alias("jaccard"),
            "aa",
            (F.col("du") * F.col("dv")).cast("long").alias("pa"),
        )
    )
    w = Window.orderBy(
        F.col("cn").desc(), F.col("src").asc(), F.col("dst").asc()
    )
    return (
        full.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "src", "dst", "cn", "jaccard", "aa", "pa")
    )


def neighbor_degree_profile(
    edges: DataFrame,
    round_digits: int = 6,
) -> DataFrame:
    """Average-nearest-neighbor-degree curve knn(k) over the
    undirected graph.

    Pastor-Satorras, Vazquez & Vespignani, "Dynamical and correlation
    properties of the Internet" (PRL 2001): for each node, the mean
    degree of its neighbors; averaged over nodes of equal degree this
    yields knn(k), whose slope is the standard degree-correlation
    diagnostic — decreasing knn(k) = disassortative (the webgraph /
    Internet signature: hubs attach to leaves), increasing =
    assortative.  The scalar summary lives in ``assortativity``; this
    is the full curve that shows WHERE the mixing changes.

    Returns (k, n_nodes, avg_knn): one row per observed degree.
    Scale shape: degree table joined back onto the edge list (two
    hash joins on node keys), then two aggregations — the same shape
    as ``degree_distribution``, nothing quadratic.
    """
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nbr = (
        und.join(
            deg.select(
                F.col("src").alias("dst"), F.col("deg").alias("ndeg")
            ),
            "dst",
        )
        .groupBy("src")
        .agg(F.avg("ndeg").alias("knn_i"))
    )
    per_node = deg.join(nbr, "src")
    return (
        per_node.groupBy(F.col("deg").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(F.avg("knn_i"), round_digits).alias("avg_knn"),
        )
    )


def link_hygiene(
    edges: DataFrame,
    pages: DataFrame,
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Crawl link-hygiene rollup: orphans, sinks, and dangling
    outlinks.

    The webmaster-facing companion to the bowtie decomposition
    (``bowtie_decomposition``): per corpus, how many known pages no
    crawl path reaches (ORPHANS — zero inlinks, discoverable only via
    sitemap/seed, the coverage risk sitemaps exist to patch), how many
    pages link nowhere (SINKS — PageRank's dangling mass, the reason
    ``pagerank`` redistributes), and how many edges point at targets
    OUTSIDE the known page set (DANGLING LINKS — soft-404 candidates
    the crawler will waste fetches on; Bar-Yossef et al. WWW 2004
    measure their decay).  One row: (n_pages, n_edges, n_orphans,
    n_sinks, n_dangling_edges, frac_orphans, frac_dangling).

    Two semi/anti-joins on node keys and two rollups — no iteration.
    """
    pg = pages.select(F.col(id_col).alias("node")).distinct()
    e = edges.select("src", "dst")
    n_pages = pg.count()
    n_edges = e.count()
    linked_to = e.select(F.col("dst").alias("node")).distinct()
    orphans = pg.join(linked_to, "node", "left_anti").count()
    links_out = e.select(F.col("src").alias("node")).distinct()
    sinks = pg.join(links_out, "node", "left_anti").count()
    dangling = e.join(
        pg.select(F.col("node").alias("dst")), "dst", "left_anti"
    ).count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n_pages,
                n_edges,
                orphans,
                sinks,
                dangling,
                round(orphans / n_pages, round_digits) if n_pages else 0.0,
                round(dangling / n_edges, round_digits)
                if n_edges
                else 0.0,
            )
        ],
        "n_pages long, n_edges long, n_orphans long, n_sinks long, "
        "n_dangling_edges long, frac_orphans double, "
        "frac_dangling double",
    )


def host_h_index(
    edges: DataFrame,
    page_host,
    round_digits: int = 6,
) -> DataFrame:
    """Host-level h-index over page inlink counts.

    Hirsch's h (PNAS 2005) lifted to web hosts as in the webometrics
    literature: a host has index h if h of its pages have >= h
    inlinks each — a depth-of-authority measure a single viral page
    cannot inflate (unlike total inlinks) and a thousand 1-inlink
    pages cannot either.  ``page_host`` is a Column mapping dst page
    id -> host key.

    Per host: (host, n_pages, total_inlinks, max_inlinks, h_index).
    Shape: inlink rollup, per-host rank window, one conditional max —
    h = max rank r with inlinks_(r) >= r.
    """
    from pyspark.sql import Window

    inl = edges.groupBy(F.col("dst").alias("page")).agg(
        F.count(F.lit(1)).alias("inlinks")
    ).withColumn("host", page_host)
    w = Window.partitionBy("host").orderBy(
        F.col("inlinks").desc(), F.col("page").asc()
    )
    ranked = inl.withColumn("r", F.row_number().over(w))
    return ranked.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("inlinks").alias("total_inlinks"),
        F.max("inlinks").alias("max_inlinks"),
        F.coalesce(
            F.max(
                F.when(F.col("inlinks") >= F.col("r"), F.col("r"))
            ),
            F.lit(0),
        ).alias("h_index"),
    )


def rich_club(
    edges: DataFrame,
    k_values=(1, 2, 3, 5, 8),
    round_digits: int = 6,
) -> DataFrame:
    """Rich-club coefficient phi(k) of the undirected graph.

    Zhou & Mondragon (IEEE Comm. Letters 2004) / Colizza et al.
    (Nature Physics 2006): among the nodes of degree > k, how close
    to complete is their induced subgraph?

        phi(k) = 2 * E_k / (N_k * (N_k - 1))

    A rising phi(k) = hubs preferentially interconnect (the
    "oligarchy" structure of the AS graph); webgraphs usually show a
    weak club.  Complements the scalar assortativity and the knn(k)
    curve with the induced-subgraph view.

    Per k: (k, n_rich, e_rich, phi).  Shape: degree rollup + one
    edge semi-join per k against the broadcast rich set.
    """
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    uedge = und.filter(F.col("src") < F.col("dst"))
    out = None
    for k in k_values:
        rich = deg.filter(F.col("deg") > k).select(
            F.col("src").alias("node")
        )
        n_rich = rich.count()
        e_rich = (
            uedge.join(
                rich.select(F.col("node").alias("src")), "src", "left_semi"
            )
            .join(
                rich.select(F.col("node").alias("dst")), "dst", "left_semi"
            )
            .count()
        )
        phi = (
            round(2.0 * e_rich / (n_rich * (n_rich - 1)), round_digits)
            if n_rich > 1
            else None
        )
        row = edges.sparkSession.createDataFrame(
            [(k, n_rich, e_rich, phi)],
            "k long, n_rich long, e_rich long, phi double",
        )
        out = row if out is None else out.unionByName(row)
    return out


def frontier_policy_overlap(
    edges: DataFrame,
    k: int = 100,
    d: float = 0.85,
    iters: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Crawl-prioritization policy agreement — inlink count vs OPIC-
    style cash vs random-id baseline, top-k overlap.

    The policy question of Cho, Garcia-Molina & Page ("Efficient
    crawling through URL ordering", WWW 1998): does the cheap signal
    (inlink count, one aggregation) pick the same frontier head as
    the expensive one (link-cash diffusion)?  Measured here as top-k
    set overlap between orderings, with a pinned arbitrary ordering
    (doc id) as the agreement floor.  High inlink/OPIC overlap is the
    empirical license to run the cheap policy — the WWW 1998
    conclusion, checked on this graph.

    OPIC proxy: ``iters`` synchronous rounds of uniform cash
    diffusion with damping ``d`` (the same localCheckpoint-per-round
    iterative shape as ``pagerank``).

    One row per policy pair: (policy_a, policy_b, k, overlap,
    jaccard).
    """
    from pyspark.sql import Window

    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    inl = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("score")
    )
    inlinks_rank = nodes.join(inl, "node", "left").na.fill(
        {"score": 0}
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    cash = nodes.withColumn("c", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        flow = (
            edges.join(
                cash.select(F.col("node").alias("src"), "c"), "src"
            )
            .join(outdeg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("c") / F.col("deg")).alias("inflow"))
        )
        cash = (
            nodes.join(flow, "node", "left")
            .na.fill({"inflow": 0.0})
            .select(
                "node",
                (
                    F.lit((1 - d) / n_nodes)
                    + F.lit(d) * F.col("inflow")
                ).alias("c"),
            )
            .localCheckpoint()
        )

    def topk(df, score_col, asc_id=False):
        order = (
            [F.col("node").asc()]
            if asc_id
            else [
                F.round(F.col(score_col), 9).desc(),
                F.col("node").asc(),
            ]
        )
        w = Window.orderBy(*order)
        return (
            df.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .select("node")
        )

    tops = {
        "inlinks": topk(inlinks_rank, "score"),
        "opic": topk(cash, "c"),
        "random_id": topk(nodes.withColumn("z", F.lit(0)), "z",
                          asc_id=True),
    }
    spark = edges.sparkSession
    rows = []
    names = list(tops)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            inter = tops[a].join(tops[b], "node").count()
            rows.append(
                (
                    a,
                    b,
                    k,
                    inter,
                    round(inter / (2 * k - inter), round_digits),
                )
            )
    return spark.createDataFrame(
        rows,
        "policy_a string, policy_b string, k long, overlap long, "
        "jaccard double",
    )


def host_link_locality(
    edges: DataFrame,
    host_of,
    round_digits: int = 6,
) -> DataFrame:
    """Intra- vs inter-host link locality per host — the block
    structure crawl partitioning exploits.

    The empirical basis for host-partitioned crawling and the
    host-block graph compression of ``ops/bvgraph.py`` (Bharat et al.
    "Who links to whom", and the WebGraph locality findings):
    most links stay within a host, so host-contiguous layouts
    compress and host-local processing avoids shuffles.  Per source
    host: outlink counts split internal/external and the locality
    share; ``host_of`` maps a node id -> host key.

    Per host: (host, n_outlinks, n_internal, n_external, locality).
    """
    tagged = edges.select(
        host_of(F.col("src")).alias("host"),
        (host_of(F.col("src")) == host_of(F.col("dst"))).alias(
            "internal"
        ),
    )
    return tagged.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_outlinks"),
        F.sum(F.col("internal").cast("long")).alias("n_internal"),
        F.sum((~F.col("internal")).cast("long")).alias("n_external"),
        F.round(
            F.sum(F.col("internal").cast("long"))
            / F.count(F.lit(1)),
            round_digits,
        ).alias("locality"),
    )


def edge_embeddedness(
    edges: DataFrame,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Edge embeddedness and local bridges — Granovetter's weak ties,
    computed.

    Granovetter, "The strength of weak ties" (AJS 1973), with the
    network-analysis operationalization of Easley & Kleinberg
    (Networks, Crowds and Markets §3): an edge's EMBEDDEDNESS is the
    number of common neighbors of its endpoints; embeddedness-0 edges
    are LOCAL BRIDGES — the shortcuts between communities that carry
    novel information (and, in a web graph, the cross-community links
    TrustRank-style propagation should treat differently from
    within-cluster mass).  Reported: the top-``k`` most embedded
    edges plus the bridge count/fraction as constant columns.

    Per edge row: (rank, src, dst, embeddedness, n_edges, n_bridges,
    bridge_frac).  Shape: the common-neighbor count is one join of
    the edge list with the undirected adjacency on each endpoint —
    the wedge-join shape of ``triangle_counts``.
    """
    from pyspark.sql import Window

    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ue = und.filter(F.col("src") < F.col("dst"))
    # common neighbors: n adjacent to both src and dst
    a = und.select(F.col("src").alias("u"), F.col("dst").alias("n"))
    common = (
        ue.join(
            a.withColumnRenamed("u", "src").withColumnRenamed(
                "n", "cn"
            ),
            "src",
        )
        .join(
            a.select(
                F.col("u").alias("dst"), F.col("n").alias("cn")
            ),
            ["dst", "cn"],
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("emb"))
    )
    scored = ue.join(common, ["src", "dst"], "left").na.fill(
        {"emb": 0}
    )
    tot = scored.agg(
        F.count(F.lit(1)).alias("ne"),
        F.sum((F.col("emb") == 0).cast("long")).alias("nb"),
    ).collect()[0]
    w = Window.orderBy(
        F.col("emb").desc(), F.col("src").asc(), F.col("dst").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "src",
            "dst",
            F.col("emb").alias("embeddedness"),
            F.lit(int(tot.ne)).alias("n_edges"),
            F.lit(int(tot.nb)).alias("n_bridges"),
            F.round(
                F.lit(tot.nb / tot.ne), round_digits
            ).alias("bridge_frac"),
        )
    )
