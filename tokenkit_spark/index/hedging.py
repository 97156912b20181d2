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
