"""KMV (k-minimum-values) distinct-count sketch — accuracy audit vs
the exact per-group distinct count.

Bar-Yossef, Jayram, Kumar, Sivakumar & Trevisan, "Counting distinct
elements in a data stream" (RANDOM 2002) — the KMV estimator: hash
every element to (0,1), keep the k smallest distinct hash values, and
estimate the cardinality as (k-1)/r_k where r_k is the k-th minimum.
Beyer et al. (SIGMOD 2007) give the unbiased form used here and the
relative-error bound ~ 1/sqrt(k-2). KMV is the sketch behind DataSketches
theta sketches and the classic mergeable alternative to HLL
(``ops/events.py:cardinality``) — this audit reports both next to the
exact count so the error contract is empirical, the same shape as the
Count-Min audit (``ops/heavyhitters.py:count_min_audit``).

The hash is a pinned multiplicative congruence, stated exactly so the
DuckDB oracle reproduces it bit-for-bit (no engine-hash dependence):

    h(u) = (u * 2654435761 + 12345) mod 2147483647,  r = h / 2^31

(2654435761 is Knuth's 2^32/phi multiplier; the modulus is the
Mersenne prime 2^31-1, so r < 1 strictly.)

Scale shape: one hash aggregate for the exact side, and for the sketch
side one (group, hash)-distinct + per-group row_number window taking
the k-th minimum — the window partitions by group so the shuffle is
group-keyed; the sketch never materializes more than k rows per group
past the filter. Groups with fewer than k distinct values are exact by
construction (the estimator is only applied when r_k exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MULT = 2654435761
_ADD = 12345
_MOD = 2147483647  # 2^31 - 1


def kmv_hash(col: F.Column) -> F.Column:
    """Pinned (0,1) hash of an integer column (see module docstring)."""
    return ((col.cast("long") * _MULT + _ADD) % _MOD) / F.lit(
        float(1 << 31)
    )


def kmv_audit(
    events: DataFrame,
    group_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group KMV estimate vs exact distinct count:
    (group, exact_distinct, kth_min, kmv_estimate, rel_err) ordered by
    group. Groups with < k distinct hashes fall back to the exact count
    (the sketch is lossless below k)."""
    vals = (
        events.select(
            F.col(group_col).alias("grp"),
            kmv_hash(F.col(id_col)).alias("r"),
        )
        .distinct()
    )
    exact = vals.groupBy("grp").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    wg = Window.partitionBy("grp").orderBy("r")
    kth = (
        vals.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") == k)
        .select("grp", F.col("r").alias("kth_min"))
    )
    est = F.when(
        F.col("kth_min").isNotNull(), (F.lit(k) - 1) / F.col("kth_min")
    ).otherwise(F.col("exact_distinct").cast("double"))
    return (
        exact.join(kth, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "exact_distinct",
            F.round(F.coalesce(F.col("kth_min"), F.lit(0.0)), round_digits)
            .alias("kth_min"),
            F.round(est, round_digits).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                round_digits,
            ).alias("rel_err"),
        )
        .orderBy(group_col)
    )
