"""Logarithmic-merge policy cost audit for incremental index builds.

Lester, Zobel & Williams, "Efficient Online Index Maintenance for
Contiguous Inverted Lists" (CIKM 2004 / Inf. Proc. Mgmt 2006) and
Büttcher & Clarke's logarithmic merge: an index ingesting B batches
can either re-merge everything on each arrival (IMMEDIATE MERGE —
query-optimal single segment, O(B²) total write cost) or keep a
geometric ladder of segments with ratio r (Lucene's
``LogMergePolicy`` / ``mergeFactor``): arrival i triggers a merge of
the last r^l batches for every level l >= 1 with r^l | i, giving
O(B·log_r B) writes but up to (r-1)·log_r B live segments per query.

This audit computes the EXACT cost of both policies over the real
corpus (batch j = the actual token mass of docs with doc_id % B == j,
arriving in order j = 1..B), not an asymptotic claim:

    cost_immediate = Σ_{i=1..B} Σ_{j<=i} tok(j)
    cost_log       = Σ_{i=1..B} Σ_{l>=1, r^l | i} Σ_{j=i-r^l+1..i} tok(j)
    segments_log   = Σ of base-r digits of B   (ladder occupancy)

plus the write amplification of each (cost / total tokens).  This is
the merge-POLICY complement of the size-tiered merge planner
(``index/merge.py:tiered_merge_plan``, which plans one merge round;
this audits the lifetime cost of the policy choice) — at 10^12 docs
the difference between amp ≈ B/2 and amp ≈ log_r B is the difference
between an unshippable build and a nightly one.

Scale shape: the batch-mass relation is one hash aggregate over the
corpus; the policy simulation is arithmetic over a generated
(arrival i, level l) relation of size B·log_r B — thousands of rows
for any real B — joined to the B-row batch masses.  No driver loops,
no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def log_merge_audit(
    docs: DataFrame,
    n_batches: int = 27,
    merge_factor: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """One-row policy audit: (n_batches, merge_factor, total_tokens,
    cost_immediate, cost_log, amp_immediate, amp_log, segments_log)."""
    b, r = int(n_batches), int(merge_factor)
    toks_per_doc = F.size(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    )
    batches = (
        docs.select(
            ((F.col(id_col) % b) + 1).alias("batch"),
            toks_per_doc.alias("ntok"),
        )
        .groupBy("batch")
        .agg(F.sum("ntok").alias("tok"))
    )
    spark = docs.sparkSession
    # cumulative batch mass once; both policies read from it
    cum = batches.crossJoin(
        F.broadcast(batches.select(F.col("batch").alias("j"),
                                   F.col("tok").alias("tokj")))
    )
    # immediate merge: arrival i rewrites batches 1..i
    imm = (
        cum.filter(F.col("j") <= F.col("batch"))
        .agg(F.sum("tokj").alias("cost_immediate"))
    )
    max_level = max(1, int(math.log(b, r)))
    levels = spark.range(1, max_level + 1).select(
        F.col("id").alias("lvl"), F.pow(F.lit(float(r)), F.col("id"))
        .cast("long").alias("span")
    )
    # (arrival i, level l) merge events: r^l | i ; each merges batches
    # (i - r^l, i]
    events = (
        batches.select(F.col("batch").alias("i"))
        .crossJoin(F.broadcast(levels))
        .filter(F.col("i") % F.col("span") == 0)
    )
    logc = (
        events.join(
            batches.select(F.col("batch").alias("j"),
                           F.col("tok").alias("tokj")),
            (F.col("j") > F.col("i") - F.col("span"))
            & (F.col("j") <= F.col("i")),
        )
        .agg(F.sum("tokj").alias("cost_log"))
    )
    total = batches.agg(F.sum("tok").alias("total_tokens"))
    # ladder occupancy after B arrivals = sum of base-r digits of B
    digits, x = 0, b
    while x > 0:
        digits += x % r
        x //= r
    return (
        total.crossJoin(F.broadcast(imm))
        .crossJoin(F.broadcast(logc))
        .select(
            F.lit(b).alias("n_batches"),
            F.lit(r).alias("merge_factor"),
            "total_tokens",
            "cost_immediate",
            "cost_log",
            F.round(
                F.col("cost_immediate") / F.col("total_tokens"), round_digits
            ).alias("amp_immediate"),
            F.round(
                F.col("cost_log") / F.col("total_tokens"), round_digits
            ).alias("amp_log"),
            F.lit(digits).cast("long").alias("segments_log"),
        )
    )


LSM_FANOUTS = (4, 10, 16)


def lsm_write_amp_plan(
    docs,
    buffer_mb: float = 64.0,
    bytes_per_doc_col: str = "n_chars",
    round_digits: int = 6,
):
    """LSM compaction-policy write-amplification sheet — leveled vs
    tiered at candidate fanouts.

    O'Neil et al. (Acta Informatica 1996, the LSM-tree paper) with
    the standard cost model (Dayan & Idreos, "Dostoevsky", SIGMOD
    2018 formalize it): with memtable/buffer B, data volume D and
    fanout T, the level count is L = ceil(log_T(D/B)); LEVELED
    compaction rewrites each level ~T/2 times per merge for
    write-amp ~ L * T / 2 but keeps at most L runs to read;
    TIERED writes each datum once per level (write-amp ~ L) but
    accumulates up to T runs per level (read-amp ~ L * T).  The
    log-structured segment merging in this package (``merge_plan``'s
    size-tiered policy) sits at the tiered end; this sheet prices
    the alternative per fanout on the measured corpus volume.

    Per fanout: (fanout, levels, leveled_write_amp,
    tiered_write_amp, leveled_read_runs, tiered_read_runs).
    """
    import math

    total = docs.agg(
        F.sum(bytes_per_doc_col).alias("b")
    ).collect()[0].b
    d_mb = float(total) / (1024 * 1024)
    spark = docs.sparkSession
    rows = []
    for t in LSM_FANOUTS:
        levels = max(
            1, math.ceil(math.log(max(d_mb / buffer_mb, t), t))
        )
        rows.append(
            (
                t,
                levels,
                round(levels * t / 2.0, round_digits),
                float(levels),
                levels,
                levels * t,
            )
        )
    return spark.createDataFrame(
        rows,
        "fanout long, levels long, leveled_write_amp double, "
        "tiered_write_amp double, leveled_read_runs long, "
        "tiered_read_runs long",
    )
