"""Cross-source distribution harmonization — quantile normalization.

Bolstad, Irizarry, Astrand & Speed, "A comparison of normalization
methods for high density oligonucleotide array data" (Bioinformatics
2003) — the quantile-normalization workhorse, applied to corpus
harmonization: per-source score distributions (length, quality,
perplexity) are NOT comparable across sources, so any global
threshold over-filters one source and under-filters another (the
per-source-calibration lesson of the CCNet pipeline).  Quantile
normalization maps each value to the POOLED distribution's value at
the same within-source rank:

    pr        = (rank - 1) / (n_source - 1)       (percent rank)
    idx       = pr * (N_pool - 1)                 (fractional index)
    mapped    = pool[floor(idx)] + frac * (pool[floor+1] - pool[floor])

— after which every source has (up to interpolation) the same
distribution and one global threshold is fair.

Returns per source: (grp, n, mean_raw, mean_mapped, max_abs_shift) —
the audit view; the mapped per-row values are the intermediate the
caller can keep.

Scale shape: one rank window per source, one global rank for the
pool, the mapping is a range join on the integer floor index (an
equi-join, not an interpolation search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize_audit(
    rows: DataFrame,
    value_col: str,
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    v = rows.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("x"),
    )
    n_pool = v.count()
    wp = Window.orderBy(F.col("x").asc(), F.col("grp").asc())
    pool = v.withColumn("pr_idx", F.row_number().over(wp) - 1).select(
        F.col("pr_idx"), F.col("x").alias("pool_x")
    )
    wg = Window.partitionBy("grp").orderBy(F.col("x").asc())
    ranked = (
        v.withColumn("r", F.row_number().over(wg))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    )
    pr = F.when(
        F.col("n") > 1,
        (F.col("r") - 1) / (F.col("n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    idx = pr * (n_pool - 1)
    lo = F.floor(idx).cast("long")
    frac = idx - lo
    j = (
        ranked.withColumn("lo", lo)
        .withColumn("frac", frac)
        .join(pool.withColumnRenamed("pool_x", "x_lo"),
              F.col("lo") == F.col("pr_idx"))
        .drop("pr_idx")
        .join(
            pool.withColumnRenamed("pool_x", "x_hi"),
            F.least(F.col("lo") + 1, F.lit(n_pool - 1))
            == F.col("pr_idx"),
        )
        .withColumn(
            "mapped",
            F.col("x_lo")
            + F.col("frac") * (F.col("x_hi") - F.col("x_lo")),
        )
    )
    return j.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("x"), round_digits).alias("mean_raw"),
        F.round(F.avg("mapped"), round_digits).alias("mean_mapped"),
        F.round(
            F.max(F.abs(F.col("mapped") - F.col("x"))), round_digits
        ).alias("max_abs_shift"),
    )
