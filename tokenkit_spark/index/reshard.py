"""Resharding-movement audit: modulo routing vs a consistent-hash ring.

Karger et al., "Consistent hashing and random trees" (STOC 1997): when
a fleet grows from N to N+1 shards, modulo routing (`hash % N`, the ES
default contract audited in ``index/routing.py``) remaps ~N/(N+1) of
all documents — a full-index reshuffle — while a consistent-hash ring
with virtual nodes moves only ~1/(N+1), the documents the new shard
actually takes over. This audit measures both movements EXACTLY on the
corpus, plus the ring's load balance, so the layout decision is
empirical (the trade ES made differently: fixed shard counts + mod
routing + split-by-doubling).

Ring construction, pinned for the oracle: shard j contributes
``vnodes`` ring points at positions md5("s<j>#<v>")[:8] (32-bit); a
document sits at md5("<doc_id>|pos")[:8] and is owned by the nearest
ring point CLOCKWISE — argmin of (ring_pos - doc_pos) mod 2^32, ties
by (shard, vnode). The wraparound is handled by the modular distance,
not a sentinel.

Scale shape: the ring is N*vnodes rows — broadcast it; assignment is a
map-side broadcast join + per-doc min (here argmin via one window over
the fan-out, ~128 rows per doc; a production kernel would binary-search
the sorted ring inside a pandas UDF, same output). Movement is one
projection comparing two assignments — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RING_SPAN = 1 << 32


def _md5_32(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def ring_points(spark, n_shards: int, vnodes: int = 8) -> DataFrame:
    """(shard, vnode, pos) — the pinned ring."""
    return (
        spark.range(n_shards)
        .select(F.col("id").alias("shard"))
        .crossJoin(
            spark.range(vnodes).select(F.col("id").alias("vnode"))
        )
        .select(
            "shard",
            "vnode",
            _md5_32(
                F.concat(
                    F.lit("s"),
                    F.col("shard").cast("string"),
                    F.lit("#"),
                    F.col("vnode").cast("string"),
                )
            ).alias("pos"),
        )
    )


def ring_assign(
    docs: DataFrame, ring: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shard) under the consistent-hash ring: owner = nearest
    ring point clockwise by modular distance."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _md5_32(
            F.concat(F.col(id_col).cast("string"), F.lit("|pos"))
        ).alias("dpos"),
    )
    fan = d.join(F.broadcast(ring))
    dist = (F.col("pos") - F.col("dpos") + _RING_SPAN) % _RING_SPAN
    w = Window.partitionBy("doc_id").orderBy(
        dist.asc(), F.col("shard").asc(), F.col("vnode").asc()
    )
    return (
        fan.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("doc_id", "shard")
    )


def reshard_movement_audit(
    docs: DataFrame,
    n_shards: int = 16,
    vnodes: int = 8,
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """One row: exact document movement when growing n -> n+1 shards
    under modulo routing vs the consistent ring, plus the ring's load
    imbalance at n+1: (n_docs, moved_mod, moved_ring, frac_mod,
    frac_ring, ring_max_share)."""
    spark = docs.sparkSession
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _md5_32(
            F.concat(F.col(id_col).cast("string"), F.lit("|route"))
        ).alias("h"),
    )
    mod_moved = d.select(
        (
            (F.col("h") % n_shards) != (F.col("h") % (n_shards + 1))
        ).cast("long").alias("m")
    ).agg(F.sum("m").alias("moved_mod"))
    r_n = ring_assign(docs, ring_points(spark, n_shards, vnodes), id_col)
    r_n1 = ring_assign(
        docs, ring_points(spark, n_shards + 1, vnodes), id_col
    ).withColumnRenamed("shard", "shard1")
    ring_moved = (
        r_n.join(r_n1, "doc_id")
        .select(
            (F.col("shard") != F.col("shard1")).cast("long").alias("m"),
            "shard1",
        )
    )
    agg = ring_moved.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("m").alias("moved_ring"),
    )
    share = (
        ring_moved.groupBy("shard1")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("max_c"))
    )
    return (
        agg.crossJoin(F.broadcast(mod_moved))
        .crossJoin(F.broadcast(share))
        .select(
            "n_docs",
            "moved_mod",
            "moved_ring",
            F.round(F.col("moved_mod") / F.col("n_docs"), round_digits)
            .alias("frac_mod"),
            F.round(F.col("moved_ring") / F.col("n_docs"), round_digits)
            .alias("frac_ring"),
            F.round(F.col("max_c") / F.col("n_docs"), round_digits).alias(
                "ring_max_share"
            ),
        )
    )


def hrw_assign(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shard) under Highest-Random-Weight (rendezvous)
    hashing: shard = argmax over s of md5(doc_id | 'hrw' | s), ties
    (md5 collisions, practically absent) by lower shard id."""
    spark = docs.sparkSession
    nodes = spark.range(n_shards).select(F.col("id").alias("s"))
    scored = (
        docs.select(F.col(id_col).alias("doc_id"))
        .crossJoin(F.broadcast(nodes))
        .select(
            "doc_id",
            "s",
            _md5_32(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|hrw|"),
                    F.col("s").cast("string"),
                )
            ).alias("w"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("w").desc(), F.col("s").asc()
    )
    return (
        scored.withColumn("r", F.row_number().over(win))
        .filter(F.col("r") == 1)
        .select("doc_id", F.col("s").alias("shard"))
    )


def hrw_movement_audit(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Rendezvous (HRW) hashing audit — the ringless minimal-movement
    router.

    Thaler & Ravishankar, "Using name-based mappings to increase hit
    rates" (IEEE/ACM ToN 1998): each key independently scores every
    node with h(key, node) and routes to the argmax.  Adding node
    n+1 moves EXACTLY the keys whose new node wins their argmax —
    expectation 1/(n+1) of keys, the same minimal-disruption bound as
    the consistent ring (``reshard_movement_audit``) but with no
    vnode tuning and provably perfect balance in expectation (every
    node wins a key with probability 1/n); the price is O(n) hash
    evaluations per key, which is why rendezvous wins for shard
    counts in the tens-to-hundreds and rings win for thousands.

    One row: (n_docs, moved_hrw, frac_hrw, expected_frac, max_share,
    min_share) — exact movement n_shards -> n_shards+1 plus the load
    spread at n_shards.  Scale shape: a broadcast of the tiny node
    table against the doc ids and one per-doc argmax window keyed by
    doc — embarrassingly parallel, no shuffle wider than the window.
    """
    a0 = hrw_assign(docs, n_shards, id_col)
    a1 = hrw_assign(docs, n_shards + 1, id_col).withColumnRenamed(
        "shard", "shard1"
    )
    j = a0.join(a1, "doc_id")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("shard") != F.col("shard1")).cast("long")
        ).alias("moved_hrw"),
    )
    spread = (
        a0.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("max_c"), F.min("c").alias("min_c"))
    )
    return agg.crossJoin(F.broadcast(spread)).select(
        "n_docs",
        "moved_hrw",
        F.round(F.col("moved_hrw") / F.col("n_docs"), round_digits).alias(
            "frac_hrw"
        ),
        F.round(
            F.lit(1.0) / F.lit(float(n_shards + 1)), round_digits
        ).alias("expected_frac"),
        F.round(F.col("max_c") / F.col("n_docs"), round_digits).alias(
            "max_share"
        ),
        F.round(F.col("min_c") / F.col("n_docs"), round_digits).alias(
            "min_share"
        ),
    )
