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


def kmv_set_ops(
    events: DataFrame,
    group_a: str,
    group_b: str,
    group_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Theta-sketch set operations on two KMV sketches (the
    DataSketches theta union/intersection rules — Dasgupta, Lang,
    Rhodes & Thaler, "A Framework for Estimating Stream Expression
    Cardinalities", EDBT 2016): for groups A and B of ``group_col``,

    * union:        k smallest distinct hashes of A ∪ B, (k-1)/r_k
    * intersection: theta = min(theta_A, theta_B); estimate =
                    |{common distinct hashes < theta}| / theta
    * jaccard:      intersection / union estimates

    each reported NEXT TO its exact value — the audit shape.  One
    summary row: (k, exact_a, est_a, exact_b, est_b, exact_union,
    est_union, exact_intersection, est_intersection, est_jaccard).

    Scale shape: sketches are k-row relations after the per-group
    window; the set ops touch only sketch rows.  Groups smaller than k
    are exact (theta = 1).
    """
    vals = (
        events.filter(F.col(group_col).isin([group_a, group_b]))
        .select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("u"),
            kmv_hash(F.col(id_col)).alias("r"),
        )
        .distinct()
    )

    def theta_of(grp):
        # always ONE row (theta NULL when the group has < k hashes),
        # so the assembly cross-joins never wipe the summary row
        wg = Window.partitionBy(F.lit(1)).orderBy("r")
        g = vals.filter(F.col("grp") == grp)
        return (
            g.withColumn("rn", F.row_number().over(wg))
            .agg(
                F.min(F.when(F.col("rn") == k, F.col("r"))).alias("theta")
            )
        )

    def est(theta_col, exact_col):
        return F.when(
            theta_col.isNotNull(), (F.lit(k) - 1) / theta_col
        ).otherwise(exact_col.cast("double"))

    a = vals.filter(F.col("grp") == group_a).select("u", "r")
    b = vals.filter(F.col("grp") == group_b).select("u", "r")
    w1 = Window.partitionBy(F.lit(1)).orderBy("r")
    uni = a.unionByName(b).distinct()
    kth_u = uni.withColumn("rn", F.row_number().over(w1)).agg(
        F.min(F.when(F.col("rn") == k, F.col("r"))).alias("theta_u")
    )
    inter = a.join(b.select("u"), "u", "left_semi")

    ex = (
        a.agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("exact_b")))
        .crossJoin(uni.agg(F.count(F.lit(1)).alias("exact_union")))
        .crossJoin(
            inter.agg(F.count(F.lit(1)).alias("exact_intersection"))
        )
        .crossJoin(theta_of(group_a).select(F.col("theta").alias("ta")))
        .crossJoin(theta_of(group_b).select(F.col("theta").alias("tb")))
        .crossJoin(kth_u)
    )
    theta = F.least(
        F.coalesce(F.col("ta"), F.lit(1.0)),
        F.coalesce(F.col("tb"), F.lit(1.0)),
    )
    inter_below = inter.crossJoin(
        ex.select(
            F.least(
                F.coalesce(F.col("ta"), F.lit(1.0)),
                F.coalesce(F.col("tb"), F.lit(1.0)),
            ).alias("th")
        )
    ).filter(F.col("r") < F.col("th")).agg(
        F.count(F.lit(1)).alias("n_inter_below")
    )
    out = ex.crossJoin(inter_below).select(
        F.lit(k).alias("k"),
        "exact_a",
        F.round(est(F.col("ta"), F.col("exact_a")), round_digits).alias(
            "est_a"
        ),
        "exact_b",
        F.round(est(F.col("tb"), F.col("exact_b")), round_digits).alias(
            "est_b"
        ),
        "exact_union",
        F.round(
            est(F.col("theta_u"), F.col("exact_union")), round_digits
        ).alias("est_union"),
        "exact_intersection",
        F.round(F.col("n_inter_below") / theta, round_digits).alias(
            "est_intersection"
        ),
    )
    return out.withColumn(
        "est_jaccard",
        F.round(
            F.col("est_intersection")
            / F.greatest(F.col("est_union"), F.lit(1e-12)),
            round_digits,
        ),
    )
