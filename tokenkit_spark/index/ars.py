"""Adaptive replica selection — Elasticsearch's C3-based replica
ranking (Suresh, Canini, Schmid & Feldmann, "C3: Cutting Tail Latency
in Cloud Data Stores via Adaptive Replica Selection", NSDI 2015; ES
6.1+ enables it by default as ``cluster.routing.use_adaptive_replica_
selection``).

Each coordinating node scores every replica of a shard with the C3
rank — smaller is better:

    q_hat(s) = 1 + os(s) * n_clients + q(s)
    rank(s)  = R(s) - 1/mu(s) + q_hat(s)^3 / mu(s)

where R is the EWMA response time, mu the EWMA service rate (1/mu =
service time), q the sampled queue depth, os the coordinator's own
outstanding requests to that replica, and the CUBIC queue penalty is
what makes a busy replica's rank blow up before it saturates (the
paper's key design point: the b=3 exponent balances load *and* demotes
replicas that are already queueing).

The audit ranks replicas per shard and reports the winner plus the
rank spread — run over a fleet's stats snapshot it answers "is
selection actually spreading load, and which replicas never win".

Scale shape: one window partitioned by shard over a replicas-sized
relation, pure Catalyst arithmetic.  Stats snapshots for 10^5 shards x
replicas are tiny rows; the same expression scores 10^9 (query,
replica) pairs map-side if applied per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def c3_rank(
    r_ewma,
    service_time,
    queue,
    outstanding,
    n_clients: int,
):
    """The C3 rank expression; ``service_time`` = 1/mu."""
    q_hat = 1.0 + outstanding * float(n_clients) + queue
    return r_ewma - service_time + (q_hat * q_hat * q_hat) * service_time


def replica_selection(
    stats: DataFrame,
    n_clients: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """``stats``: (shard, replica, r_ewma, service_time, queue,
    outstanding).  Returns one row per (shard, replica):
    (shard, replica, rank_score, choice, is_winner) where ``choice``
    is the replica's 1-based rank within its shard (ties broken on
    replica id) and ``is_winner`` marks the selected replica."""
    ranked = stats.withColumn(
        "rank_score",
        F.round(
            c3_rank(
                F.col("r_ewma"),
                F.col("service_time"),
                F.col("queue"),
                F.col("outstanding"),
                n_clients,
            ),
            round_digits,
        ),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("rank_score").asc(), F.col("replica").asc()
    )
    return ranked.withColumn(
        "choice", F.row_number().over(w).cast("long")
    ).select(
        "shard",
        "replica",
        "rank_score",
        "choice",
        (F.col("choice") == 1).alias("is_winner"),
    )
