"""Traffic-concentration audit — Gini coefficient, Lorenz shares.

Gini (1912) over per-key activity counts, computed with the exact
sorted-rank identity (e.g. Dixon et al., Ecology 1987):

    G = (2 * sum_i i * x_i) / (n * sum_i x_i) - (n + 1) / n

with x ascending and i = 1..n — ties are safe because permuting equal
values leaves the sum unchanged.  Concentration is a first-class
crawl/serving diagnostic: a head-heavy host distribution decides
partition salting, politeness budgets, and cache sizing (the same
skew the index build tames with doc-shard salt), and a near-zero Gini
on a field that should be organic is itself a synthetic-data smell —
the distributional cousin of the Benford digit audit (``benford.py``).

Output per group: n_keys, total, gini, top-1-key share, and the share
held by the top decile of keys (ceil(n/10) keys — the Lorenz point
operators actually quote).

Scale shape: one rollup to (group, key) counts, one per-group sort
window for ranks (the same shape as every top-k in this repo), one
hash aggregate.  The window partitions by group, so skew across
groups distributes; for a single colossal group the rank could ride
the range-partition + offset trick of ``index/reorder.assign_ids``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini_concentration(
    events: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """(grp, n_keys, total, gini, top1_share, top_decile_share)."""
    counts = events.groupBy(
        F.col(group_col).alias("grp"), F.col(key_col).alias("k")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("grp").orderBy(
        F.col("x").asc(), F.col("k").asc()
    )
    ranked = counts.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("x").alias("total"),
        F.sum(F.col("i") * F.col("x")).alias("ix"),
        F.max("x").alias("max_x"),
    )
    decile = (
        ranked.join(
            agg.select("grp", "n_keys"), "grp"
        )
        .filter(
            F.col("i") > F.col("n_keys") - F.ceil(F.col("n_keys") / 10)
        )
        .groupBy("grp")
        .agg(F.sum("x").alias("decile_x"))
    )
    n = F.col("n_keys").cast("double")
    return (
        agg.join(decile, "grp")
        .select(
            "grp",
            "n_keys",
            "total",
            F.round(
                2.0 * F.col("ix") / (n * F.col("total"))
                - (n + 1.0) / n,
                round_digits,
            ).alias("gini"),
            F.round(
                F.col("max_x") / F.col("total"), round_digits
            ).alias("top1_share"),
            F.round(
                F.col("decile_x") / F.col("total"), round_digits
            ).alias("top_decile_share"),
        )
    )
