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
