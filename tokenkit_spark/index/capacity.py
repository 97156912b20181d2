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


def index_capacity_forecast(
    docs,
    multipliers=(1, 10, 100, 1000),
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
):
    """Index capacity projection from measured growth laws — the
    sizing sheet for a 10^12-doc build, grounded in this corpus.

    Combines the two empirical laws the index actually obeys:
    vocabulary grows as Heaps' V = K * T^beta (fit by the same
    checkpoint OLS as ``ops/textstats.heaps_fit``; Heaps 1978), and
    postings grow linearly in tokens at the corpus's measured
    postings-per-token ratio.  Bytes ride the measured delta+varint
    cost per posting (held constant across scale — conservative,
    since denser lists shrink gaps; the codec audits in
    ``svb.py``/``ef.py`` quantify by how much).  For each scale
    multiplier m:

        tokens_proj   = m * T
        vocab_proj    = exp(ln_k) * tokens_proj ^ beta
        postings_proj = m * P
        index_mb_proj = postings_proj * bytes_per_posting / 2^20

    Returns one row per multiplier: (mult, tokens_proj, vocab_proj,
    postings_proj, bytes_per_posting, index_mb_proj).

    Scale shape: one tokenize pass feeding three aggregates (the
    Heaps checkpoints, the postings count, the exact varint bytes) —
    the forecast itself is a projection over a broadcast 1-row stats
    relation crossed with the tiny multiplier table.
    """
    from pyspark.sql import Window

    from tokenkit_spark.index.reorder import varint_len

    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z']+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    new_terms = (
        toks.groupBy("term")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("new_terms"))
    )
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        dl.join(new_terms, id_col, "left")
        .fillna(0, subset=["new_terms"])
        .select(
            F.log(F.sum("dl").over(w).cast("double")).alias("x"),
            F.log(F.sum("new_terms").over(w).cast("double")).alias("y"),
        )
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    heaps = pts.agg(
        F.exp(F.max("x")).alias("t_total"),
        slope.alias("beta"),
        (F.avg("y") - slope * F.avg("x")).alias("ln_k"),
    )
    postings = toks.groupBy("term", id_col).agg(
        F.count("*").alias("tf")
    )
    wt = Window.partitionBy("term").orderBy(id_col)
    gaps = postings.select(
        "term",
        (
            F.col(id_col)
            - F.coalesce(F.lag(id_col).over(wt), F.lit(0))
        ).alias("gap"),
    )
    pstats = gaps.agg(
        F.count(F.lit(1)).alias("p_total"),
        F.sum(varint_len(F.col("gap"))).alias("p_bytes"),
    )
    mult = spark.createDataFrame(
        [(int(m),) for m in multipliers], "mult long"
    )
    base = heaps.crossJoin(pstats)
    proj = mult.crossJoin(F.broadcast(base)).select(
        "mult",
        F.round(F.col("mult") * F.col("t_total"), 0)
        .cast("long")
        .alias("tokens_proj"),
        F.round(
            F.exp(F.col("ln_k"))
            * F.pow(F.col("mult") * F.col("t_total"), F.col("beta")),
            0,
        )
        .cast("long")
        .alias("vocab_proj"),
        (F.col("mult") * F.col("p_total")).alias("postings_proj"),
        F.round(
            F.col("p_bytes") / F.col("p_total"), round_digits
        ).alias("bytes_per_posting"),
        F.round(
            F.col("mult")
            * F.col("p_total")
            * (F.col("p_bytes") / F.col("p_total"))
            / F.lit(float(1 << 20)),
            round_digits,
        ).alias("index_mb_proj"),
    )
    return proj.orderBy("mult")


def spimi_build_plan(
    docs,
    buffer_mb: float = 512.0,
    merge_fanout: int = 16,
    bytes_per_posting: float = 12.0,
    text_col: str = "text",
    round_digits: int = 4,
):
    """SPIMI build plan — blocks and merge passes from measured
    posting volume.

    Heinz & Zobel, "Efficient single-pass index construction for text
    databases" (JASIST 2003) / IIR §4.3: single-pass in-memory
    indexing fills a memory buffer with postings, flushes a sorted
    block, and k-way-merges the blocks; the whole build cost is
    governed by two numbers this plan derives from the corpus —

        n_blocks     = ceil(postings * bytes_per_posting / buffer)
        merge_passes = ceil(log_fanout(n_blocks))   (1 pass when
                       blocks <= fanout — the common case to aim for)

    ``bytes_per_posting`` defaults to the in-memory struct cost (id +
    tf + dictionary amortization), NOT the compressed on-disk cost
    the codec audits measure — the buffer holds uncompressed
    postings.  One row: (n_postings, est_buffer_postings, n_blocks,
    merge_passes, total_io_passes) with total_io = 1 write + passes
    read/writes — the knob sheet for sizing executor memory vs
    shuffle rounds in the distributed build (``index/build.py``
    makes the same trade with partition sizing).
    """
    import math

    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
        F.col("doc_id"),
    )
    n_postings = (
        toks.groupBy("term", "doc_id").count().count()
    )
    buf_postings = int(buffer_mb * 1024 * 1024 / bytes_per_posting)
    n_blocks = max(1, math.ceil(n_postings / buf_postings))
    passes = (
        0
        if n_blocks == 1
        else max(1, math.ceil(math.log(n_blocks, merge_fanout)))
    )
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_postings,
                buf_postings,
                n_blocks,
                passes,
                1 + passes,
            )
        ],
        "n_postings long, est_buffer_postings long, n_blocks long, "
        "merge_passes long, total_io_passes long",
    )
