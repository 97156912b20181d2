"""URL-frontier scheduling: politeness-aware crawl ordering.

The constraint that shapes every crawler: a host may only be fetched
once per politeness interval, so the frontier must interleave hosts —
a million queued URLs on one host cannot monopolize the fetch fleet.

Relational formulation (no queues, no driver state): within each host,
rank URLs by priority (wave = per-host fetch slot, 0-based); the fetch
order is then (wave, priority desc) — wave w contains at most one URL
per host, so executing waves in order respects per-host politeness
while keeping every fetcher busy. This is exactly the Mercator
front/back-queue discipline expressed as two window functions, and it
scales: one shuffle on host for the wave numbering, one global sort
that Spark executes as a range-partitioned sort at any frontier size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_frontier(
    urls: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """(host, url, priority, ...) -> + (wave, fetch_order): wave is the
    per-host politeness slot (0 = that host's best URL); fetch_order is
    the global dispatch sequence — all of wave 0 (best-first across
    hosts), then wave 1, ... Ties break on url for determinism.

    The global sequence is built WITHOUT a global window (which would
    single-partition a 10^10-row frontier): rank within wave (a
    distributed window keyed on wave), plus each wave's start offset
    from a cumulative sum over the per-wave counts — a table with one
    row per wave (bounded by the deepest host queue), broadcast back.
    A wave holds at most one row per host; if a single wave outgrows a
    task at extreme host counts, the next knob is sub-bucketing each
    wave by priority band before ranking.
    """
    per_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    ranked = urls.withColumn("wave", F.row_number().over(per_host) - 1)
    in_wave = Window.partitionBy("wave").orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    offsets = (
        ranked.groupBy("wave").count()
        .withColumn(
            "wave_offset",
            F.coalesce(
                F.sum("count").over(
                    Window.orderBy("wave").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("count")
    )
    return (
        ranked.withColumn("__rw", F.row_number().over(in_wave) - 1)
        .join(F.broadcast(offsets), "wave")
        .withColumn("fetch_order", F.col("wave_offset") + F.col("__rw"))
        .drop("__rw", "wave_offset")
    )


def frontier_budget(
    urls: DataFrame,
    per_host_cap: int,
    host_col: str = "host",
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """Crawl-budget enforcement: keep each host's top ``per_host_cap``
    URLs by priority and drop the rest — the standard defense against
    crawler traps (calendars, faceted search) that generate unbounded
    URL spaces under one host."""
    per_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    return (
        urls.withColumn("__r", F.row_number().over(per_host))
        .filter(F.col("__r") <= per_host_cap)
        .drop("__r")
    )


def schedule_with_delays(
    urls: DataFrame,
    delays: DataFrame,
    default_delay_s: float = 1.0,
    host_col: str = "host",
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """Politeness schedule with per-host Crawl-delay: wave numbering as
    in :func:`schedule_frontier`, plus ``fetch_at_s`` = wave × the
    host's delay (robots Crawl-delay when published, ``default_delay_s``
    otherwise) — the earliest second each URL may be fetched relative to
    the host's first hit. ``delays`` is (host, delay_s), one row per
    host (broadcast-joined)."""
    per_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    d = delays.select(F.col(host_col).alias("__dh"), "delay_s")
    return (
        urls.withColumn("wave", F.row_number().over(per_host) - 1)
        .join(F.broadcast(d), F.col(host_col) == F.col("__dh"), "left")
        .withColumn(
            "fetch_at_s",
            F.col("wave") * F.coalesce(F.col("delay_s"), F.lit(float(default_delay_s))),
        )
        .drop("__dh", "delay_s")
    )


def maxmin_fair_budget(
    demands: DataFrame,
    capacity: float,
    host_col: str = "host",
    demand_col: str = "demand",
    round_digits: int = 6,
) -> DataFrame:
    """Max-min fair allocation of a crawl budget across hosts —
    progressive filling in closed form.

    Bertsekas & Gallager, "Data Networks" (1987, §6.5.2): allocate a
    shared capacity so that no host can get more without taking from
    a host with less — small demands are satisfied in full, large
    ones capped at a common WATER LEVEL l chosen so that
    sum_i min(demand_i, l) = capacity.  This is the fairness rule a
    polite fetcher applies when host demand (frontier size) exceeds
    the fetch budget: trimming proportionally would starve small
    hosts; trimming max-min starves no one.

    Closed form via one sort: with demands d_(1) <= ... <= d_(n) and
    prefix sums S_k, the level sits in the first segment where the
    remaining capacity no longer covers everyone's next increment —
    l = (C - S_k) / (n - k) for the largest k with
    S_k + (n - k) * d_(k) <= C (k = 0 allowed), fully saturated if
    sum d_i <= C.  Per host: (host, demand, allocation, saturated)
    plus the level on every row.

    Scale shape: one global sort window over the HOST table (tiny
    relative to pages) + one broadcast 1-row level computation.
    """
    from pyspark.sql import Window

    d = demands.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("double").alias("demand"),
    )
    w = Window.orderBy(F.col("demand").asc(), F.col("host").asc())
    ranked = d.withColumn("k", F.row_number().over(w)).withColumn(
        "prefix",
        F.sum("demand").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    n_tot = d.count()
    total = d.agg(F.sum("demand").alias("t")).collect()[0].t
    if total <= capacity:
        level_df = demands.sparkSession.createDataFrame(
            [(float("inf"),)], "level double"
        )
    else:
        # largest k where serving everyone at d_(k) still fits
        k0row = (
            ranked.filter(
                (F.col("prefix") - F.col("demand"))
                + (F.lit(n_tot) - F.col("k") + 1) * F.col("demand")
                <= capacity
            )
            .agg(F.max("k").alias("k0"), F.max("prefix").alias("sk"))
            .collect()[0]
        )
        k0 = k0row.k0 or 0
        sk = k0row.sk or 0.0
        level = (capacity - sk) / (n_tot - k0)
        level_df = demands.sparkSession.createDataFrame(
            [(float(level),)], "level double"
        )
    return (
        d.crossJoin(F.broadcast(level_df))
        .select(
            "host",
            "demand",
            F.round(
                F.least(F.col("demand"), F.col("level")), round_digits
            ).alias("allocation"),
            (F.col("demand") > F.col("level")).alias("saturated"),
            F.round(
                F.when(
                    F.col("level") != float("inf"), F.col("level")
                ),
                round_digits,
            ).alias("level"),
        )
    )


def crawl_makespan_bound(
    demands: DataFrame,
    politeness_s: float = 1.0,
    connections: int = 64,
    host_col: str = "host",
    demand_col: str = "demand",
    round_digits: int = 6,
) -> DataFrame:
    """Crawl makespan lower bound under per-host politeness — the
    two-term bound every frontier scheduler is judged against.

    Folklore formalized in the IRLbot/Mercator analyses (Lee et al.
    WWW 2008; Heydon & Najork 1999): with per-host politeness delay d
    and c parallel connections, no schedule finishes faster than

        T* = max( max_h q_h * d,  sum_h q_h / c )

    — the HEAD term (one host's queue serialized by politeness) or
    the BANDWIDTH term, whichever binds.  The audit reports both
    terms, the binding constraint, and the head-host utilization
    sum/(c * T*) — when the head term binds, adding connections buys
    nothing and the only levers are politeness policy or host
    sharding, which is exactly the decision this number drives.

    One row: (n_hosts, total_pages, max_host_pages, head_bound_s,
    bandwidth_bound_s, makespan_lb_s, binding, utilization).
    """
    agg = demands.agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum(demand_col).alias("total"),
        F.max(demand_col).alias("mx"),
    )
    head = F.col("mx") * politeness_s
    bw = F.col("total") / float(connections)
    lb = F.greatest(head, bw)
    return agg.select(
        "n_hosts",
        F.col("total").cast("long").alias("total_pages"),
        F.col("mx").cast("long").alias("max_host_pages"),
        F.round(head, round_digits).alias("head_bound_s"),
        F.round(bw, round_digits).alias("bandwidth_bound_s"),
        F.round(lb, round_digits).alias("makespan_lb_s"),
        F.when(head >= bw, F.lit("politeness_head"))
        .otherwise(F.lit("bandwidth"))
        .alias("binding"),
        F.round(F.col("total") / (float(connections) * lb),
                round_digits).alias("utilization"),
    )


TIER_CUTS = ((0.8, "hot"), (0.95, "warm"))


def storage_tiering_audit(
    docs_freq: DataFrame,
    id_col: str = "doc_id",
    freq_col: str = "freq",
    bytes_col: str = "bytes",
    round_digits: int = 6,
) -> DataFrame:
    """Hot/warm/cold storage-tier assignment by access concentration.

    The S3/-IA/Glacier (or RAM/SSD/HDD) placement rule every serving
    stack applies to Zipf-shaped access: sort objects by access
    frequency, cut tiers at cumulative-access thresholds (hot serves
    the first 80% of accesses, warm to 95%, cold the tail), and read
    off how LITTLE capacity the hot tier needs — the working-set
    compression that makes tiering pay (Denning's working-set
    principle applied to object storage).

    Per tier: (tier, n_docs, docs_share, bytes, bytes_share,
    access_share).  One global sort window over the object table +
    cumulative-share cuts; ties by id pinned.
    """
    from pyspark.sql import Window

    d = docs_freq.select(
        F.col(id_col).alias("id"),
        F.col(freq_col).cast("double").alias("f"),
        F.col(bytes_col).cast("double").alias("b"),
    )
    tot = d.agg(
        F.sum("f").alias("tf"), F.sum("b").alias("tb"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    w = Window.orderBy(F.col("f").desc(), F.col("id").asc())
    cum = d.withColumn(
        "cum_f",
        F.sum("f").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # (cum - f) / total in ONE division — the oracle must reproduce the
    # exact float expression or boundary docs flip tiers
    prev_share = (F.col("cum_f") - F.col("f")) / F.lit(float(tot.tf))
    tier = (
        F.when(prev_share < TIER_CUTS[0][0], TIER_CUTS[0][1])
        .when(prev_share < TIER_CUTS[1][0], TIER_CUTS[1][1])
        .otherwise("cold")
    )
    per = cum.withColumn("tier", tier).groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("b").alias("bytes_raw"),
        F.sum("f").alias("f_raw"),
    )
    return per.select(
        "tier",
        "n_docs",
        F.round(
            F.col("n_docs") / F.lit(float(tot.n)), round_digits
        ).alias("docs_share"),
        F.col("bytes_raw").cast("long").alias("bytes"),
        F.round(
            F.col("bytes_raw") / F.lit(float(tot.tb)), round_digits
        ).alias("bytes_share"),
        F.round(
            F.col("f_raw") / F.lit(float(tot.tf)), round_digits
        ).alias("access_share"),
    )
