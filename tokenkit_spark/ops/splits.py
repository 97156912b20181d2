"""Group-disjoint train/validation/test splits with a leakage audit.

For LLM training data the split unit is never the document: near-
duplicate pages from one site straddling train and eval inflate
benchmark scores (the contamination failure mode; cf. Lee et al. 2022
"Deduplicating training data makes language models better", §6, and
the group-holdout practice in scikit-learn's GroupShuffleSplit). The
split key must be the registered domain (or source feed), and the
guard — no group in more than one split — must be CHECKED, not
assumed.

Assignment is pinned hashing, not sampling: split(g) by the first 32
bits of md5(g + "|split") mod 100 against the cumulative share table
(train < 80 <= val < 90 <= test). Deterministic, stable under
re-runs and corpus growth (a group's split never changes when other
groups appear — the property random splits lack), and restatable in
SQL for the oracle.

Scale shape: one projection to compute the group key and its hash
bucket (no shuffle — the hash is computed per row), one hash aggregate
per (split, group) for the audit, one for the summary. The leakage
check is a group-keyed count-distinct-splits aggregate: any value > 1
is a leak; by construction of per-group hashing it must be 0, and the
audit PROVES it on the actual corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_split_col(
    group: F.Column,
    train_pct: int = 80,
    val_pct: int = 10,
) -> F.Column:
    """'train' / 'val' / 'test' from the pinned md5 bucket of the
    group key."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(group, F.lit("|split"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def domain_disjoint_split(
    docs: DataFrame,
    group_col: F.Column | None = None,
    train_pct: int = 80,
    val_pct: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Split summary + leakage audit in one result: per split
    (split, n_docs, n_groups, doc_share, leaked_groups) ordered by
    split, where leaked_groups counts groups observed in MORE than one
    split (must be 0 — the audit that makes the disjointness claim
    empirical). Default group key: source feed + doc_id%5 pseudo-host
    (the registered-domain stand-in for the synthetic corpus)."""
    g = (
        group_col
        if group_col is not None
        else F.concat(
            F.col("source"), F.lit("-"), (F.col("doc_id") % 5).cast("string")
        )
    )
    tagged = docs.select(
        g.alias("grp"),
        group_split_col(g, train_pct, val_pct).alias("split"),
    )
    per_group = tagged.groupBy("grp").agg(
        F.countDistinct("split").alias("n_splits"),
        F.first("split").alias("split"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    leaked = per_group.agg(
        F.sum((F.col("n_splits") > 1).cast("long")).alias("leaked_groups")
    )
    summary = per_group.groupBy("split").agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    total = summary.agg(F.sum("n_docs").alias("tot"))
    return (
        summary.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(leaked))
        .select(
            "split",
            "n_docs",
            "n_groups",
            F.round(F.col("n_docs") / F.col("tot"), round_digits).alias(
                "doc_share"
            ),
            "leaked_groups",
        )
        .orderBy("split")
    )
