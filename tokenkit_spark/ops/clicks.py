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
