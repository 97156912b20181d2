"""Search-log click analytics: position-bias estimation and debiased
document quality from SERP click logs.

At a web search engine the click log IS the 100-TB table — one row per
(query, session, position, shown doc, clicked?) impression — and the
estimators below are the standard first pass over it:

* ``position_ctr``          — per-position impression/click/CTR curve
                              plus the propensity ratio ctr(p)/ctr(1)
                              (the examination curve under PBM; Craswell
                              et al., "An Experimental Comparison of
                              Click Position-Bias Models", WSDM 2008).
* ``coec``                  — Clicks Over Expected Clicks (Zhang &
                              Jones, "Comparing Click Logs and Editorial
                              Labels for Training Query Rewriting",
                              WWW 2007 workshop): per-doc clicks divided
                              by the clicks expected from its positions'
                              global CTRs — the classic
                              position-normalized CTR feature.
* ``pbm_attractiveness``    — Position-Based Model attractiveness with
                              the examination propensity fixed to the
                              observed position-CTR curve normalized to
                              e(1)=1: alpha(q,d) = clicks / sum of
                              propensities over the impressions that
                              showed d for q (the closed-form PBM
                              estimate when examination is known;
                              Chuklin, Markov & de Rijke, "Click Models
                              for Web Search", 2015, §4.1).
* ``cascade_examination``   — cascade-model examination accounting
                              (Craswell et al. 2008 §3.3): an impression
                              at position p counts as examined iff no
                              click happened above p in the same SERP;
                              reports per-position examined counts and
                              the examined-conditioned CTR next to the
                              raw CTR it corrects.

Scale shape: every estimator is one or two hash aggregates over the
impression log (position_ctr: groupBy position; coec/PBM: a broadcast
join of the 10-row position curve onto the log, then groupBy doc);
cascade examination is a single window over (query, session) ordered by
position — the log's natural partitioning key, so the sort is local
after one shuffle. No UDFs, no driver state, no self-joins: all four
run as single-pass Catalyst plans at 10^12 impressions.

The synthetic log (``synthetic_click_log``) is deterministic arithmetic
over the documents table (one query per doc, a few sessions, a
patience-bounded click rule that yields a linearly decaying examination
curve), so the DuckDB oracle reproduces it exactly in SQL — no external
data, per the round's input rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def synthetic_click_log(
    docs: DataFrame,
    n_docs: int,
    sessions: int = 4,
    positions: int = 10,
) -> DataFrame:
    """(query_id, session_id, position, doc_id, rel, clicked) — one
    deterministic SERP impression log: one query per document, ``sessions``
    SERPs per query, ``positions`` results per SERP.

    shown doc = (q*53 + s*17 + p) mod N   (distinct within a SERP),
    relevant  = (shown*3 + q*7) mod 5 == 0,
    patience  = (q*13 + s*11) mod positions + 1   (uniform 1..positions),
    clicked   = relevant AND p <= patience  — examination probability of
    position p is (positions+1-p)/positions, a linear position bias the
    estimators must recover.
    """
    q = F.col("doc_id").alias("query_id")
    base = docs.select(q)
    s = F.explode(F.sequence(F.lit(0), F.lit(sessions - 1))).alias(
        "session_id"
    )
    p = F.explode(F.sequence(F.lit(1), F.lit(positions))).alias("position")
    log = base.select("query_id", s).select("query_id", "session_id", p)
    shown = (
        F.col("query_id") * 53 + F.col("session_id") * 17 + F.col("position")
    ) % F.lit(n_docs)
    rel = ((shown * 3 + F.col("query_id") * 7) % 5 == 0).cast("int")
    patience = (F.col("query_id") * 13 + F.col("session_id") * 11) % F.lit(
        positions
    ) + 1
    return (
        log.withColumn("doc_id", shown)
        .withColumn("rel", rel)
        .withColumn(
            "clicked",
            (F.col("rel") == 1) & (F.col("position") <= patience),
        )
        .withColumn("clicked", F.col("clicked").cast("int"))
    )


def position_ctr(log: DataFrame, round_digits: int = 6) -> DataFrame:
    """(position, impressions, clicks, ctr, propensity) — the raw
    position-CTR curve; propensity = ctr(p)/ctr(1), the PBM examination
    estimate under the rank-1-is-examined convention."""
    per_pos = log.groupBy("position").agg(
        F.count("*").alias("impressions"),
        F.sum("clicked").alias("clicks"),
    )
    top = Window.orderBy(F.lit(1))
    ctr = F.col("clicks") / F.col("impressions")
    return (
        per_pos.withColumn("ctr_raw", ctr)
        .withColumn(
            "ctr1",
            F.max(F.when(F.col("position") == 1, F.col("ctr_raw"))).over(top),
        )
        .select(
            "position",
            "impressions",
            "clicks",
            F.round("ctr_raw", round_digits).alias("ctr"),
            F.round(F.col("ctr_raw") / F.col("ctr1"), round_digits).alias(
                "propensity"
            ),
        )
        .orderBy("position")
    )


def _with_position_curve(log: DataFrame) -> DataFrame:
    """Attach the global per-position CTR (pos_ctr) and its e(1)=1
    normalization (propensity) to every impression — a broadcast join of
    a positions-sized table onto the log."""
    curve = (
        log.groupBy("position")
        .agg((F.sum("clicked") / F.count("*")).alias("pos_ctr"))
    )
    top = Window.orderBy(F.lit(1))
    curve = curve.withColumn(
        "propensity",
        F.col("pos_ctr")
        / F.max(F.when(F.col("position") == 1, F.col("pos_ctr"))).over(top),
    )
    return log.join(F.broadcast(curve), "position")


def coec(
    log: DataFrame,
    k: int = 20,
    min_impressions: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` docs by Clicks Over Expected Clicks. expected =
    sum over the doc's impressions of the global CTR of the position it
    was shown at; coec > 1 means the doc out-clicks its positions."""
    scored = (
        _with_position_curve(log)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("impressions"),
            F.sum("clicked").alias("clicks"),
            F.sum("pos_ctr").alias("expected"),
        )
        .filter(F.col("impressions") >= min_impressions)
        .filter(F.col("expected") > 0)
        .select(
            "doc_id",
            "impressions",
            "clicks",
            F.round("expected", round_digits).alias("expected_clicks"),
            F.round(F.col("clicks") / F.col("expected"), round_digits).alias(
                "coec"
            ),
        )
    )
    return scored.orderBy(
        F.desc("coec"), F.desc("clicks"), F.asc("doc_id")
    ).limit(k)


def pbm_attractiveness(
    log: DataFrame,
    k: int = 20,
    min_impressions: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` (query_id, doc_id) pairs by PBM attractiveness
    alpha = clicks / sum(propensity over impressions), the closed-form
    inverse-propensity estimate with the examination curve pinned to the
    observed position-CTR ratios."""
    scored = (
        _with_position_curve(log)
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("impressions"),
            F.sum("clicked").alias("clicks"),
            F.sum("propensity").alias("exam_mass"),
        )
        .filter(F.col("impressions") >= min_impressions)
        .filter(F.col("exam_mass") > 0)
        .select(
            "query_id",
            "doc_id",
            "impressions",
            "clicks",
            F.round(F.col("clicks") / F.col("exam_mass"), round_digits).alias(
                "alpha"
            ),
        )
    )
    return scored.orderBy(
        F.desc("alpha"),
        F.desc("clicks"),
        F.asc("query_id"),
        F.asc("doc_id"),
    ).limit(k)


def cascade_examination(log: DataFrame, round_digits: int = 6) -> DataFrame:
    """(position, impressions, examined, clicks, ctr_raw, ctr_examined)
    — cascade-model accounting: position p of a SERP is examined iff no
    click occurred at a smaller position in the same (query, session).
    ctr_examined = clicks_examined / examined is the debiased
    per-position CTR the raw curve understates at depth (only clicks at
    examined positions count — in a multi-click log a click can sit
    below an earlier click, which cascade semantics exclude)."""
    w = (
        Window.partitionBy("query_id", "session_id")
        .orderBy("position")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    examined = (
        F.coalesce(F.sum("clicked").over(w), F.lit(0)) == 0
    ).cast("int")
    flagged = log.withColumn("examined", examined)
    return (
        flagged.groupBy("position")
        .agg(
            F.count("*").alias("impressions"),
            F.sum("examined").alias("examined"),
            F.sum("clicked").alias("clicks"),
            F.sum(F.col("clicked") * F.col("examined")).alias(
                "clicks_examined"
            ),
        )
        .select(
            "position",
            "impressions",
            "examined",
            "clicks",
            F.round(
                F.col("clicks") / F.col("impressions"), round_digits
            ).alias("ctr_raw"),
            F.round(
                F.when(
                    F.col("examined") > 0,
                    F.col("clicks_examined") / F.col("examined"),
                ).otherwise(F.lit(0.0)),
                round_digits,
            ).alias("ctr_examined"),
        )
        .orderBy("position")
    )


# --------------------------------------------------------------------------
# Online evaluation: team-draft interleaving (Radlinski, Kurup & Joachims,
# "How does clickthrough data reflect retrieval quality?", CIKM 2008 §4.2)
# --------------------------------------------------------------------------


def team_draft_lists(
    ranks_a: DataFrame, ranks_b: DataFrame, depth: int = 6
) -> DataFrame:
    """The pure team-draft merge: given two per-query rankings
    (query_id, doc_id, rnk with rnk starting at 1), produce the
    interleaved list (query_id, step, doc_id, team).

    Draft rule per step t (1-based): the team with fewer picks so far
    drafts; on a tie the deterministic coin (query_id + t) mod 2 picks
    (0 -> A). The drafting team takes its highest-ranked doc not yet in
    the interleaved list; if it has none left the other team drafts
    (the paper's exhaustion fallback). The coin is pinned arithmetic so
    the whole draft — normally a sequential per-impression loop — is
    reproducible and SQL-unrollable, one CTE level per step.

    Scale shape: each step is one anti-join of the (query-keyed) rank
    relation against the picked-so-far set plus one per-query
    row_number window — all shuffles on query_id, ``depth`` is a small
    constant (the interleaved SERP length), and the picked relation is
    ``localCheckpoint``-ed per step so lineage stays linear."""
    ranks = ranks_a.select(
        "query_id", "doc_id", "rnk", F.lit("A").alias("team")
    ).unionByName(
        ranks_b.select("query_id", "doc_id", "rnk", F.lit("B").alias("team"))
    )
    picked = None
    for t in range(1, depth + 1):
        if picked is None:
            cand = ranks
            ca, cb = F.lit(0), F.lit(0)
            cnts = ranks.select("query_id").distinct().select(
                "query_id", ca.alias("ca"), cb.alias("cb")
            )
        else:
            cand = ranks.join(
                picked.select("query_id", "doc_id"), ["query_id", "doc_id"],
                "left_anti",
            )
            cnts = (
                ranks.select("query_id")
                .distinct()
                .join(
                    picked.groupBy("query_id").agg(
                        F.sum(F.when(F.col("team") == "A", 1).otherwise(0))
                        .alias("ca"),
                        F.sum(F.when(F.col("team") == "B", 1).otherwise(0))
                        .alias("cb"),
                    ),
                    "query_id",
                    "left",
                )
                .select(
                    "query_id",
                    F.coalesce("ca", F.lit(0)).alias("ca"),
                    F.coalesce("cb", F.lit(0)).alias("cb"),
                )
            )
        pref = (
            F.when(F.col("ca") < F.col("cb"), F.lit("A"))
            .when(F.col("ca") > F.col("cb"), F.lit("B"))
            .when((F.col("query_id") + t) % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
        )
        staged = cand.join(cnts, "query_id").withColumn("pref", pref)
        w = Window.partitionBy("query_id").orderBy(
            F.when(F.col("team") == F.col("pref"), 0).otherwise(1),
            F.col("rnk").asc(),
            F.col("team").asc(),
        )
        pick = (
            staged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("query_id", "doc_id", "team", F.lit(t).alias("step"))
        )
        picked = (
            pick if picked is None else picked.unionByName(pick)
        ).localCheckpoint(eager=False)
    return picked.select("query_id", "step", "doc_id", "team")


def tdi_outcome(
    ilist: DataFrame,
    rel: DataFrame,
    patience: DataFrame,
    round_digits: int = 6,
) -> DataFrame:
    """Score a team-draft interleaved list under a patience click
    model: a (query, session) impression clicks the doc at interleaved
    position ``step`` iff it is relevant (``rel``: query_id, doc_id,
    rel 0/1) and step <= that session's patience (``patience``:
    query_id, session_id, patience). Credit goes to the team that
    contributed the clicked doc; impressions with zero clicks are
    discarded (the paper's convention). Returns ONE row:
    (trials, wins_a, wins_b, ties, pref_a) with
    pref_a = (wins_a + ties/2) / trials — the TDI preference for A."""
    sim = (
        ilist.join(rel, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
        .join(patience, "query_id")
        .withColumn(
            "clicked",
            (
                (F.col("rel") == 1)
                & (F.col("step") <= F.col("patience"))
            ).cast("int"),
        )
    )
    per = sim.groupBy("query_id", "session_id").agg(
        F.sum(F.when(F.col("team") == "A", F.col("clicked")).otherwise(0))
        .alias("a_clicks"),
        F.sum(F.when(F.col("team") == "B", F.col("clicked")).otherwise(0))
        .alias("b_clicks"),
    ).filter(F.col("a_clicks") + F.col("b_clicks") > 0)
    return per.agg(
        F.count(F.lit(1)).alias("trials"),
        F.sum((F.col("a_clicks") > F.col("b_clicks")).cast("int")).alias(
            "wins_a"
        ),
        F.sum((F.col("b_clicks") > F.col("a_clicks")).cast("int")).alias(
            "wins_b"
        ),
        F.sum((F.col("a_clicks") == F.col("b_clicks")).cast("int")).alias(
            "ties"
        ),
    ).select(
        "trials",
        "wins_a",
        "wins_b",
        "ties",
        F.round(
            (F.col("wins_a") + F.col("ties") / 2.0) / F.col("trials"),
            round_digits,
        ).alias("pref_a"),
    )


# --------------------------------------------------------------------------
# Query-query similarity from co-clicks, and the bipartite click-graph
# random walk (Craswell & Szummer, "Random walks on the click graph",
# SIGIR 2007)
# --------------------------------------------------------------------------


def coclick_query_similarity(
    log: DataFrame,
    max_doc_df: int | None = 10_000,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` query pairs by Jaccard overlap of their clicked doc
    sets — the classic co-click query-similarity feature (Beeferman &
    Berger, KDD 2000 use it to cluster the click graph). Returns
    (rank, q1, q2, co_clicks, jaccard), rank by (jaccard desc, q1, q2).

    ``max_doc_df`` caps the self-join fan-out: a doc clicked for d
    queries contributes d^2 candidate pairs, so navigational mega-docs
    are excluded above the cap (same quadratic-blowup guard as
    ngram_jaccard's max_gram_df) — at web scale this is the difference
    between a bounded shuffle and a cross join."""
    qd = (
        log.filter(F.col("clicked") == 1)
        .select("query_id", "doc_id")
        .distinct()
    )
    sizes = qd.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
    if max_doc_df is not None:
        keep = (
            qd.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("ddf"))
            .filter(F.col("ddf") <= max_doc_df)
            .select("doc_id")
        )
        qd = qd.join(keep, "doc_id")
    a = qd.select(F.col("query_id").alias("q1"), "doc_id")
    b = qd.select(F.col("query_id").alias("q2"), "doc_id")
    inter = (
        a.join(b, "doc_id")
        .filter(F.col("q1") < F.col("q2"))
        .groupBy("q1", "q2")
        .agg(F.count(F.lit(1)).alias("co_clicks"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed("query_id", "q1"), "q1")
        .withColumnRenamed("n", "n1")
        .join(sizes.withColumnRenamed("query_id", "q2"), "q2")
        .withColumnRenamed("n", "n2")
        .select(
            "q1",
            "q2",
            "co_clicks",
            F.round(
                F.col("co_clicks")
                / (F.col("n1") + F.col("n2") - F.col("co_clicks")),
                round_digits,
            ).alias("jaccard"),
        )
    )
    w = Window.orderBy(
        F.col("jaccard").desc(), F.col("q1").asc(), F.col("q2").asc()
    )
    return (
        jac.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "q1", "q2", "co_clicks", "jaccard")
    )


def click_walk(
    log: DataFrame,
    seeds: list,
    steps: int = 3,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Forward random walk on the bipartite query-doc click graph
    (Craswell & Szummer, SIGIR 2007, the s=0 no-self-transition walk):
    transition Q->D and D->Q probabilities proportional to click
    counts, normalized per source node. Starting from each seed query
    with probability 1, run a fixed odd number of ``steps`` (ending on
    the doc side) and return the top-``k`` docs per seed:
    (query_id, rank, doc_id, prob) — doc relevance smoothed across the
    click graph, reaching docs the seed never clicked directly.

    Scale shape: the walk distribution is a relation
    (seed, node, prob); each step is one equi-join against the
    normalized edge list plus one hash re-aggregate — two shuffles per
    step, node-keyed, exactly the PageRank plan with a seed dimension
    riding along. Seeds are a small pinned list, so the frontier stays
    seeds x reachable-nodes, never the full Q x D cross product."""
    w_qd = (
        log.filter(F.col("clicked") == 1)
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    q_tot = w_qd.groupBy("query_id").agg(F.sum("w").alias("tot"))
    d_tot = w_qd.groupBy("doc_id").agg(F.sum("w").alias("tot"))
    fwd = w_qd.join(q_tot, "query_id").select(
        F.col("query_id").alias("src"),
        F.col("doc_id").alias("dst"),
        (F.col("w") / F.col("tot")).alias("p"),
    )
    bwd = w_qd.join(d_tot, "doc_id").select(
        F.col("doc_id").alias("src"),
        F.col("query_id").alias("dst"),
        (F.col("w") / F.col("tot")).alias("p"),
    )
    spark = log.sparkSession
    dist = spark.createDataFrame(
        [(int(s), int(s), 1.0) for s in seeds], "seed long, node long, prob double"
    )
    for t in range(steps):
        trans = fwd if t % 2 == 0 else bwd
        dist = (
            dist.join(trans, dist["node"] == trans["src"])
            .select("seed", F.col("dst").alias("node"),
                    (F.col("prob") * F.col("p")).alias("c"))
            .groupBy("seed", "node")
            .agg(F.sum("c").alias("prob"))
            .localCheckpoint(eager=False)
        )
    wk = Window.partitionBy("seed").orderBy(
        F.round(F.col("prob"), round_digits).desc(), F.col("node").asc()
    )
    return (
        dist.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            F.col("seed").alias("query_id"),
            "rank",
            F.col("node").alias("doc_id"),
            F.round("prob", round_digits).alias("prob"),
        )
    )


# --------------------------------------------------------------------------
# Counterfactual (off-policy) ranker evaluation with inverse propensity
# scoring (Joachims, Swaminathan & Schnabel, "Unbiased learning-to-rank
# with biased feedback", WSDM 2017; Li et al., "Offline evaluation of
# ranking policies with click models", KDD 2018)
# --------------------------------------------------------------------------


def ips_policy_value(
    log: DataFrame,
    rankers: DataFrame,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Estimate each candidate ranker's expected clicks per SERP from
    the LOGGED clicks alone — no new interleaving experiment:

    under PBM, E[clicks(B)] = sum_d alpha(q,d) * e(rank_B(d)); the log
    gives an unbiased alpha estimate clicked / e(p_logged), so

        V(B) = (1/#SERPs) * sum_impressions clicked
               * e(rank_B(q, doc)) / e(p_logged)

    restricted to docs B ranks within top-``k``. The examination curve
    e(p) is the observed position-CTR normalized to e(1)=1 — the same
    propensity the PBM attractiveness estimator uses.

    ``rankers``: (ranker, query_id, doc_id, rnk) — each candidate's
    per-query ranking. Returns one row per ranker:
    (ranker, serps, logged_ctr_serp, ips_clicks_serp), ordered by
    ranker; logged_ctr_serp is the logged policy's realized
    clicks/SERP for reference.

    Scale shape: one broadcast of the positions-sized propensity
    curve, one (query, doc)-keyed join of the log against the ranker
    table, one hash aggregate per ranker — the log is touched once for
    every candidate ranker simultaneously."""
    # zero-propensity positions (never-clicked ranks) carry no usable
    # signal and would divide by zero — the standard IPS support guard
    curve = (
        _with_position_curve(log)
        .select(
            "query_id", "session_id", "position", "doc_id", "clicked",
            "propensity",
        )
        .filter(F.col("propensity") > 0)
    )
    serps = log.select("query_id", "session_id").distinct().count()
    rk = rankers.filter(F.col("rnk") <= k)
    # e(rank_B): propensity of the candidate position, from the same
    # normalized curve keyed by position
    pos_e = (
        _with_position_curve(log)
        .select("position", "propensity")
        .distinct()
        .withColumnRenamed("position", "rnk")
        .withColumnRenamed("propensity", "e_new")
    )
    joined = (
        curve.join(rk, ["query_id", "doc_id"])
        .join(F.broadcast(pos_e), "rnk")
        .withColumn(
            "w",
            F.col("clicked") * F.col("e_new") / F.col("propensity"),
        )
    )
    ips = joined.groupBy("ranker").agg(F.sum("w").alias("v"))
    logged = log.agg(
        (F.sum("clicked") / F.lit(serps)).alias("logged_ctr_serp")
    )
    return (
        ips.crossJoin(F.broadcast(logged))
        .select(
            "ranker",
            F.lit(serps).cast("long").alias("serps"),
            F.round("logged_ctr_serp", round_digits).alias(
                "logged_ctr_serp"
            ),
            F.round(F.col("v") / serps, round_digits).alias(
                "ips_clicks_serp"
            ),
        )
        .orderBy("ranker")
    )


def eb_ctr_shrinkage(
    log: DataFrame,
    item_col: str = "item",
    click_col: str = "clicked",
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-item CTR.

    Robbins' empirical Bayes (1956) with the standard beta-binomial
    method-of-moments fit (the smoothing every CTR feature pipeline
    applies before feeding rates to a ranker — raw CTR over 3
    impressions is noise): fit a Beta(alpha, beta) prior to the
    MARGINAL distribution of raw item CTRs by moment matching,

        alpha + beta = m (1 - m) / v - 1,   alpha = m (alpha + beta)

    with m, v the mean and sample variance of raw CTRs, then shrink
    every item toward the prior mean:

        ctr_eb = (clicks + alpha) / (views + alpha + beta)

    Low-traffic items collapse to the prior; high-traffic items keep
    their rate — the bias/variance dial sets itself from the data.
    Top-``k`` items by (shrunk CTR desc, item), plus the prior so the
    shrinkage is inspectable.

    Scale shape: one item rollup, one 1-row moment fit broadcast
    back; moments from explicit sums (cross-engine exactness, same
    policy as ``ops/abtest.py``).
    """
    per = log.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("views"),
        F.sum(F.col(click_col).cast("long")).alias("clicks"),
    ).withColumn("ctr", F.col("clicks") / F.col("views"))
    mom = per.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("ctr").alias("s"),
        F.sum(F.col("ctr") * F.col("ctr")).alias("ss"),
    ).select(
        (F.col("s") / F.col("n")).alias("m"),
        (
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v"),
    )
    ab = mom.select(
        "m",
        "v",
        (F.col("m") * (1.0 - F.col("m")) / F.col("v") - 1.0).alias(
            "ab_sum"
        ),
    ).select(
        (F.col("m") * F.col("ab_sum")).alias("alpha"),
        ((1.0 - F.col("m")) * F.col("ab_sum")).alias("beta"),
    )
    shrunk = per.crossJoin(F.broadcast(ab)).withColumn(
        "ctr_eb",
        (F.col("clicks") + F.col("alpha"))
        / (F.col("views") + F.col("alpha") + F.col("beta")),
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        F.round("ctr_eb", 9).desc(), F.col("item").asc()
    )
    return (
        shrunk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "item",
            "views",
            "clicks",
            F.round("ctr", round_digits).alias("ctr_raw"),
            F.round("ctr_eb", round_digits).alias("ctr_eb"),
            F.round("alpha", round_digits).alias("alpha"),
            F.round("beta", round_digits).alias("beta"),
        )
    )
