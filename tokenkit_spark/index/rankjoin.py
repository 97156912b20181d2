"""Fagin's Threshold Algorithm — early-stopping rank aggregation over
two sorted score lists.

Fagin, Lotem & Naor, "Optimal aggregation algorithms for middleware"
(PODS 2001, Godel prize 2014): to find the top-k objects by a
monotone combination s = sA + sB of two independently-sorted lists,
walk both lists in parallel SORTED access, random-access each newly
seen object's other score, and STOP at depth d once k seen objects
have full score >= the threshold tau_d = sA(d) + sB(d) — no unseen
object can beat tau_d.  On real (correlated, skewed) score lists the
stop depth is a tiny fraction of n, which is why TA is the classic
middleware/rank-join primitive (and the ancestor of every NRA/rank-
join variant).

This audit evaluates the halting condition on a geometric depth grid
(1, 2, 4, ... — sorted access in batches, exactly how a distributed
TA would round-trip) and reports, per configured k: the first grid
depth where TA may stop, the scan fraction, and whether the top-k at
that depth already equals the exact full-join top-k (it must — the
assertion is part of the audit).

Scale shape: both rankings are global window ranks (range-partition
at scale); the halting check is |grid| x (per-depth aggregates) over
the first-seen-ordered relation — never the n^2 all-pairs the naive
formulation suggests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fagin_ta_audit(
    list_a: DataFrame,
    list_b: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """``list_a``/``list_b``: (doc_id, score) over the same objects.
    One row per grid depth until (and including) the stop depth:
    (depth, tau, n_seen, n_above_tau, stopped, topk_exact)."""
    a = list_a.select(
        F.col(id_col).alias("doc_id"), F.col("score").alias("sa")
    )
    b = list_b.select(
        F.col(id_col).alias("doc_id"), F.col("score").alias("sb")
    )
    wa = Window.orderBy(F.col("sa").desc(), F.col("doc_id").asc())
    wb = Window.orderBy(F.col("sb").desc(), F.col("doc_id").asc())
    ra = a.withColumn("ra", F.row_number().over(wa))
    rb = b.withColumn("rb", F.row_number().over(wb))
    full = ra.join(rb, "doc_id").select(
        "doc_id",
        "sa",
        "sb",
        "ra",
        "rb",
        (F.col("sa") + F.col("sb")).alias("s"),
        F.least("ra", "rb").alias("first_seen"),
    )
    n = full.count()
    # exact top-k of the full combination
    wf = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
    exact = full.withColumn("fr", F.row_number().over(wf)).filter(
        F.col("fr") <= k
    )
    depths = []
    d = 1
    while d < n:
        depths.append(d)
        d *= 2
    depths.append(n)
    spark = list_a.sparkSession
    grid = spark.createDataFrame([(x,) for x in depths], "depth long")
    # tau at depth d: d-th score of each list
    tau = (
        grid.join(
            full.select(F.col("ra").alias("depth"), F.col("sa")), "depth"
        )
        .join(
            full.select(F.col("rb").alias("depth"), F.col("sb")), "depth"
        )
        .select("depth", (F.col("sa") + F.col("sb")).alias("tau"))
    )
    seen = (
        F.broadcast(tau)
        .crossJoin(full.select("first_seen", "s", "doc_id"))
        .filter(F.col("first_seen") <= F.col("depth"))
        .groupBy("depth", "tau")
        .agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.sum(
                (F.col("s") >= F.col("tau")).cast("long")
            ).alias("n_above_tau"),
        )
        .withColumn("stopped", F.col("n_above_tau") >= k)
    )
    # first stopping depth
    stop_d = (
        seen.filter(F.col("stopped"))
        .agg(F.min("depth").alias("sd"))
        .collect()[0]
        .sd
    )
    if stop_d is None:
        stop_d = n
    # does the seen top-k at the stop depth equal the exact top-k?
    seen_at = full.filter(F.col("first_seen") <= stop_d)
    ws = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
    seen_topk = seen_at.withColumn(
        "sr", F.row_number().over(ws)
    ).filter(F.col("sr") <= k)
    n_match = (
        seen_topk.join(
            exact.select(F.col("doc_id").alias("ed")),
            seen_topk.doc_id == F.col("ed"),
        ).count()
    )
    return (
        seen.filter(F.col("depth") <= stop_d)
        .select(
            "depth",
            F.round("tau", round_digits).alias("tau"),
            "n_seen",
            "n_above_tau",
            "stopped",
            F.lit(n_match == k).alias("topk_exact"),
            F.round(F.col("depth") / F.lit(float(n)), round_digits).alias(
                "frac_scanned"
            ),
        )
    )
