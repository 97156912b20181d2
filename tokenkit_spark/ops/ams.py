"""AMS second-frequency-moment sketch — join-size estimation audit.

Alon, Matias & Szegedy, "The space complexity of approximating the
frequency moments" (STOC 1996, the Godel-prize paper that started
streaming sketches): F2 = sum_v cnt_v^2 is exactly the size of a
self-equi-join on the key — the quantity a query planner needs to
cost a join on that key (and the denominator of the planner's
independence assumption audited in ``index/planstats.py``).  The AMS
"tug-of-war" estimator keeps k counters X_i = sum_v s_i(v) * cnt_v
with 4-wise-independent signs s_i(v) in {-1, +1}: E[X_i^2] = F2 and
Var[X_i^2] <= 2*F2^2, so averaging groups and taking the median of
group means gives an (eps, delta) guarantee in O(1/eps^2 *
log(1/delta)) counters — constant memory per group regardless of key
cardinality.

Pinned for the oracle: 16 estimators = 4 groups x 4, sign i of key v
from the parity of the keyed 32-bit md5 of "<v>|ams|<i>"; the final
estimate is the MEDIAN OF THE 4 GROUP MEANS (even count — the two
middle values average, DuckDB ``median`` semantics).  Output per
group: exact F2 (the audit's ground truth), the sketch estimate, and
the signed relative error.

Scale shape: the sketch side is ONE pass — each row contributes to
all 16 counters via a broadcast fan-out of the 16-row estimator
table, partial-aggregated map-side; the exact twin needs the
(group, key) rollup.  On a real stream only the sketch side runs;
counters merge across partitions/batches by addition, which is the
whole point of the estimator family (same mergeability contract as
the KMV/CMS/HLL sketches elsewhere in this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_EST = 16
N_GROUPS = 4


def _sign(key_col, i_col):
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    key_col.cast("string"),
                    F.lit("|ams|"),
                    i_col.cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (F.lit(1) - F.lit(2) * (h % 2)).cast("double")


def ams_f2(
    events: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """(grp, n_keys, exact_f2, est_f2, rel_err): AMS tug-of-war F2
    estimate (16 estimators, median of 4 group means) vs the exact
    self-join size per group."""
    spark = events.sparkSession
    keyed = events.select(
        F.col(group_col).alias("grp"), F.col(key_col).alias("k")
    )
    exact = (
        keyed.groupBy("grp", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("c") * F.col("c")).alias("exact_f2"),
        )
    )
    ests = spark.range(N_EST).select(F.col("id").alias("i"))
    x = (
        keyed.crossJoin(F.broadcast(ests))
        .groupBy("grp", "i")
        .agg(F.sum(_sign(F.col("k"), F.col("i"))).alias("x"))
    )
    means = (
        x.withColumn("g", (F.col("i") % N_GROUPS))
        .groupBy("grp", "g")
        .agg(F.avg(F.col("x") * F.col("x")).alias("m"))
    )
    est = means.groupBy("grp").agg(F.median("m").alias("est_f2"))
    return exact.join(est, "grp").select(
        "grp",
        "n_keys",
        F.col("exact_f2").cast("long").alias("exact_f2"),
        F.round("est_f2", round_digits).alias("est_f2"),
        F.round(
            (F.col("est_f2") - F.col("exact_f2")) / F.col("exact_f2"),
            round_digits,
        ).alias("rel_err"),
    )
