"""Shard-routing balance audit: is the doc->shard hash actually flat?

Every distributed index stands on one assumption: routing docs by
hash(doc_id) % n_shards spreads both DOCUMENTS and POSTINGS evenly, so
no shard becomes the straggler that bounds query latency (ES routes by
`hash(_routing) % num_primary_shards`; our build's doc-shard salt in
index/build.py makes the same bet). This audit measures the bet: per
shard, the doc count and token mass plus each one's load factor vs the
uniform ideal. A token_load of 1.4 means that shard serves 40% more
postings than its fair share — the number a capacity planner actually
needs, and the early-warning for hot-spot doc-id patterns (e.g.
auto-increment ids under a weak hash).

The route hash is the keyed-md5 trick used across this repo
(ops/sampling.py:sample_fraction_col): first 8 hex chars of
md5(id || '|' || salt) as an unsigned 32-bit integer, mod n_shards —
bit-identical in Spark and in the DuckDB oracle, unlike Spark's
internal Murmur3 `hash()`.

Scale shape: one projection + one n_shards-row hash aggregate; the
share/load factors come from a window over the n_shards-row result.
Nothing driver-side. At 10^12 docs this is a single map-side-combined
pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def route_shard_col(id_col, n_shards: int, salt: str = "route"):
    """Deterministic shard id for a document id: the first 32 bits of
    the keyed md5, mod ``n_shards`` (always non-negative)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % n_shards).cast("long")


def shard_routing_audit(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "route",
    round_digits: int = 6,
) -> DataFrame:
    """Per-shard routing balance: (shard, n_docs, n_tokens, doc_share,
    token_share, doc_load, token_load), ordered by shard. ``*_load`` is
    the shard's mass over the uniform ideal (total / n_shards); a flat
    hash sits near 1.0 everywhere."""
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    ).cast("long")
    per_shard = (
        docs.select(
            route_shard_col(id_col, n_shards, salt).alias("shard"),
            toks.alias("n_toks"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        per_shard.withColumn("tot_docs", F.sum("n_docs").over(w))
        .withColumn("tot_tokens", F.sum("n_tokens").over(w))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.col("tot_docs"), round_digits).alias(
                "doc_share"
            ),
            F.round(F.col("n_tokens") / F.col("tot_tokens"), round_digits).alias(
                "token_share"
            ),
            F.round(
                F.col("n_docs") / (F.col("tot_docs") / F.lit(float(n_shards))),
                round_digits,
            ).alias("doc_load"),
            F.round(
                F.col("n_tokens") / (F.col("tot_tokens") / F.lit(float(n_shards))),
                round_digits,
            ).alias("token_load"),
        )
        .orderBy("shard")
    )


def replica_apportionment(
    qlog: DataFrame,
    n_shards: int = 16,
    total_replicas: int = 32,
    key_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Load-proportional replica apportionment — Hamilton's
    largest-remainder method over measured shard load.

    The replica-placement question behind ES's index-level
    ``number_of_replicas`` being one-size-fits-all: shards do NOT
    receive equal query load (term routing + Zipf queries), so a
    fixed replica count under-provisions hot shards.  Apportion
    ``total_replicas`` proportionally to measured load with the
    classic Hamilton/Vinton method (US House apportionment, 1852):
    each shard gets floor(quota), remaining seats go to the largest
    fractional remainders (ties by shard id) — exactly the
    deterministic integer allocation a placement controller wants
    (Huntington-Hill's divisor alternative trades monotonicity
    paradoxes; largest-remainder is the simple standard).  Every
    shard gets at least one replica (the primary).

    Per shard: (shard, load, quota, base, extra, replicas,
    load_per_replica).
    """
    from pyspark.sql import Window

    from tokenkit_spark.index.routing import route_shard_col

    load = (
        qlog.select(
            route_shard_col(key_col, n_shards, salt="qroute").alias(
                "shard"
            )
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("load"))
    )
    tot = load.agg(F.sum("load").alias("t")).collect()[0].t
    # reserve 1 replica per shard, apportion the rest by load
    free = total_replicas - n_shards
    quota = F.col("load") / F.lit(float(tot)) * F.lit(float(free))
    q = (
        load.withColumn("quota", quota)
        .withColumn("base", F.floor("quota").cast("long"))
        .withColumn("remainder", F.col("quota") - F.col("base"))
    )
    used = q.agg(F.sum("base").alias("u")).collect()[0].u or 0
    leftover = int(free - used)
    w = Window.orderBy(
        F.round("remainder", 9).desc(), F.col("shard").asc()
    )
    ranked = q.withColumn("rr", F.row_number().over(w))
    return ranked.select(
        "shard",
        "load",
        F.round("quota", round_digits).alias("quota"),
        "base",
        (F.col("rr") <= leftover).cast("int").alias("extra"),
        (
            F.lit(1)
            + F.col("base")
            + (F.col("rr") <= leftover).cast("long")
        ).alias("replicas"),
        F.round(
            F.col("load")
            / (
                F.lit(1)
                + F.col("base")
                + (F.col("rr") <= leftover).cast("long")
            ),
            round_digits,
        ).alias("load_per_replica"),
    )


def shard_bloom_skip_audit(
    docs: DataFrame,
    queries: DataFrame,
    n_shards: int = 16,
    m_bits: int = 1024,
    n_hashes: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-shard term Bloom filters as a shard-skipping index — probe
    savings and false-probe cost, exactly replayed.

    The broker-side shard pruning trick (the same idea ES runs per
    SEGMENT with its terms index, lifted to the shard map): each
    shard publishes an m-bit Bloom filter of its term vocabulary;
    the broker probes the filters and fans a term only to shards
    whose filter says maybe.  For every (query term, shard) this
    audit compares the filter's answer against the exact posting
    presence:

        (query_id, n_terms, probes_total, probes_skipped,
         false_probes, skip_frac, false_probe_frac)

    with probes_total = n_terms * n_shards.  False probes cost one
    wasted RPC each; missed-skip never happens (no false negatives) —
    the asymmetry that makes the filter safe to deploy.  All bit
    positions are keyed md5 arithmetic (oracle-identical).
    """
    toks = docs.select(
        route_shard_col(id_col, n_shards).alias("shard"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()

    def bitpos(term_col, i):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            term_col, F.lit(f"|sbloom{i}|")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )

    bits = None
    for i in range(n_hashes):
        b = toks.select(
            "shard", bitpos(F.col("term"), i).alias("bit")
        )
        bits = b if bits is None else bits.unionByName(b)
    shard_bits = bits.distinct()
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    shards = docs.sparkSession.range(n_shards).select(
        F.col("id").cast("long").alias("shard")
    )
    probes = qterms.crossJoin(F.broadcast(shards))
    pbits = None
    for i in range(n_hashes):
        pb = probes.select(
            "query_id", "term", "shard",
            bitpos(F.col("term"), i).alias("bit"),
        )
        pbits = pb if pbits is None else pbits.unionByName(pb)
    setcount = (
        pbits.join(shard_bits, ["shard", "bit"], "left_semi")
        .groupBy("query_id", "term", "shard")
        .agg(F.countDistinct("bit").alias("nset"))
    )
    needed = pbits.groupBy("query_id", "term", "shard").agg(
        F.countDistinct("bit").alias("nbits")
    )
    maybe = (
        needed.join(setcount, ["query_id", "term", "shard"], "left")
        .na.fill({"nset": 0})
        .withColumn("maybe", F.col("nset") == F.col("nbits"))
    )
    actual = toks.select("shard", "term").distinct()
    verdict = maybe.join(
        actual.withColumn("present", F.lit(True)),
        ["shard", "term"],
        "left",
    ).na.fill({"present": False})
    return (
        verdict.groupBy("query_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.count(F.lit(1)).alias("probes_total"),
            F.sum((~F.col("maybe")).cast("long")).alias(
                "probes_skipped"
            ),
            F.sum(
                (F.col("maybe") & ~F.col("present")).cast("long")
            ).alias("false_probes"),
        )
        .select(
            "query_id",
            "n_terms",
            "probes_total",
            "probes_skipped",
            "false_probes",
            F.round(
                F.col("probes_skipped")
                / F.col("probes_total").cast("double"),
                round_digits,
            ).alias("skip_frac"),
            F.round(
                F.col("false_probes")
                / F.col("probes_total").cast("double"),
                round_digits,
            ).alias("false_probe_frac"),
        )
    )


def shard_balance_audit(
    docs: DataFrame,
    n_shards: int = 32,
    doc_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Hash-routing shard balance audit — how hot is the hottest
    shard.

    Document-hashed routing (the default of every sharded index)
    balances only in expectation; the operative SLO numbers are the
    coefficient of variation of shard sizes and the max/mean "hot
    shard" factor, in both docs and bytes — a byte-hot shard is the
    one that misses latency targets even when doc counts look even
    (balls-into-bins: with n docs into s shards the expected max
    exceeds n/s by ~sqrt(2 (n/s) ln s)).  Routing uses the keyed-md5
    doc hash so the audit is reproducible across engines.

    One row: (n_shards_used, n_docs, sum_docs_sq, max_docs,
    total_bytes, max_bytes) — exact integer sufficient statistics
    only, so the audit hashes identically on every engine.  The SLO
    derivations: mean = n_docs / n_shards_used, variance =
    sum_docs_sq / n_shards_used - mean^2, cv = sqrt(var) / mean,
    hot factor = max_docs / mean, byte hot factor =
    max_bytes / (total_bytes / n_shards_used).
    """
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("shard:"),
                        F.col(doc_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    per = docs.groupBy(shard.alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(size_col).alias("b"),
    )
    st = per.agg(
        F.count(F.lit(1)).alias("su"),
        F.sum("n").alias("t"),
        F.sum(F.col("n") * F.col("n")).alias("nn"),
        F.max("n").alias("mx"),
        F.sum("b").alias("tb"),
        F.max("b").alias("mxb"),
    )
    return st.select(
        F.col("su").alias("n_shards_used"),
        F.col("t").alias("n_docs"),
        F.col("nn").alias("sum_docs_sq"),
        F.col("mx").alias("max_docs"),
        F.col("tb").alias("total_bytes"),
        F.col("mxb").alias("max_bytes"),
    )
