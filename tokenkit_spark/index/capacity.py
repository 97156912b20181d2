"""Erlang-C serving-capacity audit — how many replicas a query class
needs for a wait-probability SLO.

Erlang's C formula (1917; the queueing result behind every serving-
capacity planner, cf. the tail-latency discussion in Dean & Barroso
CACM 2013 — ``index/hedging.py`` is the latency-side complement): for
a Poisson arrival stream of rate λ served by c replicas at rate μ
each, with offered load a = λ/μ erlangs, the probability an arriving
query finds all replicas busy (and waits) is

    P_wait(c, a) = T / (S + T),   T = (a^c/c!)·(c/(c−a)),
                                  S = Σ_{k=0}^{c−1} a^k/k!

defined for c > a (an M/M/c queue with c <= a has no steady state —
reported as P_wait = 1).  The audit measures λ per query class from
the event log (count / observed horizon), sweeps c = 1..c_max, and
reports the smallest c meeting the SLO — the shard-replica sizing
number ES's adaptive replica selection (``index/ars.py``) then load-
balances across.

Everything is exact closed-form arithmetic over a generated
(class × c × k) relation — |classes|·c_max² rows, tiny at any corpus
scale since classes are an aggregate, not rows.  Factorials stay in
the exact-integer range (c_max <= 20).  No UDFs, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def erlang_capacity(
    events: DataFrame,
    mu_per_s: float = 0.5,
    slo_p_wait: float = 0.05,
    c_max: int = 20,
    type_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Per class: (event_type, lam, offered_a, c_required, p_wait) —
    the smallest replica count meeting the SLO, or c_max with its
    (possibly violating) P_wait when none does."""
    spark = events.sparkSession
    horizon = events.agg(
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("h_s")
    )
    lam = (
        events.groupBy(F.col(type_col).alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(horizon))
        .select(
            "event_type",
            (F.col("n") / F.col("h_s")).alias("lam"),
        )
        .withColumn("a", F.col("lam") / F.lit(float(mu_per_s)))
    )
    cs = spark.range(1, c_max + 1).select(F.col("id").alias("c"))
    ks = spark.range(0, c_max).select(F.col("id").alias("k"))
    s_sum = (
        lam.crossJoin(F.broadcast(cs))
        .join(F.broadcast(ks), F.col("k") < F.col("c"))
        .groupBy("event_type", "a", "lam", "c")
        .agg(
            F.sum(
                F.pow(F.col("a"), F.col("k")) / F.factorial(F.col("k").cast("int"))
            ).alias("s")
        )
    )
    tail = (
        F.pow(F.col("a"), F.col("c"))
        / F.factorial(F.col("c").cast("int"))
        * (F.col("c") / (F.col("c") - F.col("a")))
    )
    p = (
        s_sum.withColumn(
            "p_wait",
            F.when(F.col("c") <= F.col("a"), F.lit(1.0)).otherwise(
                tail / (F.col("s") + tail)
            ),
        )
    )
    # smallest c meeting the SLO; fall back to c_max if none does
    ok = p.withColumn(
        "pick",
        F.when(F.col("p_wait") <= slo_p_wait, F.col("c")).otherwise(
            F.lit(None)
        ),
    )
    best = ok.groupBy("event_type", "lam", "a").agg(
        F.min("pick").alias("c_required")
    ).withColumn("c_required", F.coalesce("c_required", F.lit(c_max)))
    pw = p.select(
        F.col("event_type").alias("__et"), F.col("c").alias("__c"), "p_wait"
    )
    return (
        best.join(
            pw,
            (F.col("event_type") == F.col("__et"))
            & (F.col("c_required") == F.col("__c")),
        )
        .select(
            "event_type",
            F.round("lam", round_digits).alias("lam"),
            F.round("a", round_digits).alias("offered_a"),
            F.col("c_required").cast("int").alias("c_required"),
            F.round("p_wait", round_digits).alias("p_wait"),
        )
    )
