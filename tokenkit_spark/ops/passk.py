"""Sampling-based eval estimators: unbiased pass@k and
majority-vote (self-consistency) accuracy.

The two numbers every code-gen / reasoning eval pipeline reports:
pass@k via the unbiased combinatorial estimator of Chen et al. 2021
("Evaluating Large Language Models Trained on Code", §2.1 — the
naive empirical estimator is biased high), and maj@k
(self-consistency voting, Wang et al. 2022) from the per-task
empirical correctness rate.  Inputs are per-task sample tallies
(n samples drawn, c correct), which is exactly what a distributed
eval harness aggregates; everything downstream is closed-form
per-row arithmetic plus one global mean — no shuffle beyond the
final aggregation.

Both estimators expand their k-term products/binomials as literal
expression chains (k is a small pinned constant), keeping the whole
computation inside whole-stage codegen.
"""

from math import comb

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PASS_AT_KS = (1, 5, 10)
MAJ_KS = (1, 3, 5)


def pass_at_k(
    tasks: DataFrame,
    n_col: str = "n",
    c_col: str = "c",
    ks: tuple = PASS_AT_KS,
) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021): per task
    1 - C(n-c, k)/C(n, k), expanded as the stable product
    prod_{i<k} (n-c-i)/(n-i).

    Per k: (k, n_tasks, sum_pass_e12, n_certain).  The per-task
    estimate is a fixed-order IEEE double chain (bit-identical on
    any engine that mirrors the expression), scaled to exact integer
    pico-units floor(p * 1e12) and summed as a bigint — no float
    accumulation, so the aggregate hashes identically on every
    engine.  mean pass@k = sum_pass_e12 / n_tasks / 1e12; n_certain
    counts tasks with pass@k exactly 1 (fewer than k failures).
    """
    n = F.col(n_col).cast("double")
    c = F.col(c_col).cast("double")
    parts = []
    for k in ks:
        prod = F.lit(1.0)
        for i in range(k):
            prod = prod * ((n - c - i) / (n - i))
        p = F.when(n - c >= k, F.lit(1.0) - prod).otherwise(F.lit(1.0))
        parts.append(
            tasks.select(
                F.lit(k).alias("k"), p.alias("p")
            )
        )
    per = parts[0]
    for df in parts[1:]:
        per = per.unionByName(df)
    return per.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_tasks"),
        F.sum(
            F.floor(F.col("p") * F.lit(1000000000000.0)).cast("long")
        ).alias("sum_pass_e12"),
        F.sum((F.col("p") == 1.0).cast("long")).alias("n_certain"),
    )


def majority_vote_accuracy(
    tasks: DataFrame,
    n_col: str = "n",
    c_col: str = "c",
    ks: tuple = MAJ_KS,
    round_digits: int = 6,
) -> DataFrame:
    """Self-consistency maj@k (Wang et al. 2022): with per-task
    correctness rate p = c/n, the chance that a strict majority of k
    iid samples is correct — sum_{j>k/2} C(k,j) p^j (1-p)^(k-j),
    expanded literally per (odd) k.

    Per k: (k, n_tasks, mean_maj, gain_vs_1) where gain_vs_1 is
    mean_maj minus the mean single-sample accuracy.
    """
    p = F.col(c_col).cast("double") / F.col(n_col).cast("double")
    q = F.lit(1.0) - p
    parts = []
    for k in ks:
        acc = F.lit(0.0)
        for j in range(k // 2 + 1, k + 1):
            # integer-exponent powers as multiplication chains: both
            # engines then perform bit-identical IEEE arithmetic
            # (pow() is not correctly rounded and may differ by ulps)
            term = F.lit(float(comb(k, j)))
            for _ in range(j):
                term = term * p
            for _ in range(k - j):
                term = term * q
            acc = acc + term
        parts.append(
            tasks.select(
                F.lit(k).alias("k"), acc.alias("m"), p.alias("p1")
            )
        )
    per = parts[0]
    for df in parts[1:]:
        per = per.unionByName(df)
    return per.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_tasks"),
        F.round(F.avg("m"), round_digits).alias("mean_maj"),
        F.round(F.avg("m") - F.avg("p1"), round_digits).alias(
            "gain_vs_1"
        ),
    )
