"""Hedged-request tail-latency audit (Dean & Barroso, "The Tail at
Scale", CACM 2013).

A fan-out search query is as slow as its slowest shard, so per-shard
tail latency is THE serving metric at 1000-executor scale.  Dean &
Barroso's fix: after a deferral d (their rule of thumb: ~the p95 of
the primary), issue the same sub-request to a second replica and take
the first answer —

    lat_hedged = min( lat(r0),  d + lat(r1) )

buying most of the p99 win of full duplication for a few percent extra
load (the second request only matters — and is only charged here —
when the primary is still outstanding at d).

This audit makes the trade exact over a deterministic synthetic
latency surface (pinned affine-modular base + a sparse hiccup tail,
the shape the paper measures): per shard, exact p50/p99
(percentile_disc semantics: value at rank ceil(q·n)) for the primary
and the hedged strategy, plus the hedge-issue rate.  Everything is
relational — a generated (request × shard) relation, two window ranks
partitioned by shard, one hash aggregate; no sampling, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def synth_latency(q, s, r):
    """Deterministic per-(request, shard, replica) latency (ms): base
    5 + ((q*31 + s*17 + r*13) % 40), plus a +150 hiccup when
    (q*7 + s + r) % 13 == 0 — an ~8% heavy tail."""
    base = 5 + (q * 31 + s * 17 + r * 13) % 40
    hiccup = F.when((q * 7 + s + r) % 13 == 0, F.lit(150)).otherwise(
        F.lit(0)
    )
    return (base + hiccup).cast("long")


def hedging_audit(
    spark,
    n_requests: int = 500,
    n_shards: int = 8,
    defer_ms: int = 45,
    round_digits: int = 4,
) -> DataFrame:
    """Per shard: (shard, p50_primary, p99_primary, p50_hedged,
    p99_hedged, hedge_rate, p99_speedup)."""
    reqs = spark.range(n_requests).select(F.col("id").alias("q"))
    shards = spark.range(n_shards).select(F.col("id").alias("s"))
    grid = reqs.crossJoin(F.broadcast(shards))
    lat = grid.select(
        "q",
        "s",
        synth_latency(F.col("q"), F.col("s"), F.lit(0)).alias("l0"),
        synth_latency(F.col("q"), F.col("s"), F.lit(1)).alias("l1"),
    ).select(
        "q",
        "s",
        F.col("l0").alias("primary"),
        F.least(F.col("l0"), F.lit(int(defer_ms)) + F.col("l1")).alias(
            "hedged"
        ),
        (F.col("l0") > defer_ms).cast("int").alias("hedge_fired"),
    )

    def pctl(col, q):
        # percentile_disc(q): smallest value with rank >= ceil(q*n)
        w = Window.partitionBy("s").orderBy(col)
        ranked = lat.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("s"))
        )
        return (
            ranked.filter(F.col("rn") == F.ceil(F.lit(q) * F.col("n")))
            .select("s", F.col(col).alias(f"p{int(q * 100)}_{col}"))
        )

    out = (
        pctl("primary", 0.5)
        .join(pctl("primary", 0.99), "s")
        .join(pctl("hedged", 0.5), "s")
        .join(pctl("hedged", 0.99), "s")
        .join(
            lat.groupBy("s").agg(
                F.round(F.avg("hedge_fired"), round_digits).alias(
                    "hedge_rate"
                )
            ),
            "s",
        )
    )
    return out.select(
        F.col("s").alias("shard"),
        "p50_primary",
        "p99_primary",
        "p50_hedged",
        "p99_hedged",
        "hedge_rate",
        F.round(
            F.col("p99_primary") / F.col("p99_hedged"), round_digits
        ).alias("p99_speedup"),
    )


def fanout_tail_audit(
    events: DataFrame,
    thresholds=None,
    n_shards: int = 8,
    fanouts=(1, 2, 4, 8),
    target: float = 0.99,
    latency_col: str = "value",
    user_col: str = "user_id",
    round_digits: int = 6,
) -> DataFrame:
    """The tail at scale — fan-out amplification of per-shard latency
    tails.

    Dean & Barroso, "The tail at scale" (CACM 2013): a request that
    fans out to N shards completes only when the SLOWEST replies, so
    P(fanout <= t) = prod_i P_i(X <= t) under independence — a shard
    whose p99 looks fine alone turns into a p86 when 14 such shards
    are fanned over (0.99^14).  This audit computes, per fan-out N
    (the first N of ``n_shards`` hash-assigned shards), the empirical
    per-shard CDFs on a pinned threshold grid, the independence
    fan-out CDF, and the resulting fan-out p-``target`` latency:

        (fanout, p_target_latency, p_at_single_p99, n_thresholds)

    where p_at_single_p99 is the fan-out completion probability at
    the FIRST shard's own p99-grid point — the headline number of the
    paper.  The mitigation (hedged requests) is audited next door in
    ``hedged_tail_audit``.

    Scale shape: one (shard, threshold-grid) aggregation (grid
    broadcast), a cumulative product via exp-sum-log over the shard
    order — |grid| x n_shards rows end to end.
    """
    from pyspark.sql import Window

    if thresholds is None:
        thresholds = [10.0 * i for i in range(1, 51)]
    spark = events.sparkSession
    grid = spark.createDataFrame(
        [(float(t),) for t in thresholds], "t double"
    )
    lat = events.select(
        (F.col(user_col) % n_shards).cast("int").alias("shard"),
        F.col(latency_col).cast("double").alias("x"),
    )
    counts = lat.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    cdf = (
        lat.crossJoin(F.broadcast(grid))
        .groupBy("shard", "t")
        .agg(F.sum((F.col("x") <= F.col("t")).cast("long")).alias("c"))
        .join(counts, "shard")
        .select(
            "shard", "t", (F.col("c") / F.col("n")).alias("p")
        )
    )
    # cumulative product over shards 0..N-1 at each t
    wsh = (
        Window.partitionBy("t")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cdf.withColumn(
        "hit_zero", F.max((F.col("p") == 0).cast("int")).over(wsh)
    ).withColumn(
        "p_fan",
        F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
            F.exp(
                F.sum(
                    F.when(F.col("p") > 0, F.log("p")).otherwise(
                        F.lit(0.0)
                    )
                ).over(wsh)
            )
        ),
    )
    # single-shard p99 grid point (shard 0)
    s0_p99 = (
        cum.filter((F.col("shard") == 0) & (F.col("p") >= target))
        .agg(F.min("t").alias("t99"))
    )
    out = None
    for n_f in fanouts:
        layer = cum.filter(F.col("shard") == n_f - 1)
        p_tail = (
            layer.filter(F.col("p_fan") >= target)
            .agg(F.min("t").alias("pt"))
            .select(F.col("pt").alias("p_target_latency"))
        )
        at99 = (
            layer.join(
                F.broadcast(s0_p99), layer.t == F.col("t99")
            )
            .agg(F.max("p_fan").alias("pa"))
            .select(
                F.round("pa", round_digits).alias("p_at_single_p99")
            )
        )
        row = (
            p_tail.crossJoin(at99)
            .select(
                F.lit(n_f).alias("fanout"),
                "p_target_latency",
                "p_at_single_p99",
                F.lit(len(thresholds)).alias("n_thresholds"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
