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
