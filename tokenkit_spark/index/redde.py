"""ReDDE resource selection — sample-based shard routing.

Si & Callan, "Relevant document distribution estimation method for
resource selection" (SIGIR 2003): instead of collection-level
statistics (CORI, ``index/cori.py``), keep a Central Sample Index
(CSI) — a small uniform sample of every shard's documents — run the
query against the CSI only, and let each of the top-n sampled docs
vote for its source shard with weight n_s / s_s (shard size over
sampled size): the scale-up factor that turns "hits in the sample"
into an estimate of relevant-document mass per shard. Shards ranked
by estimated mass; the broker routes to the best-m.

Determinism contract for the oracle: the CSI is the arithmetic sample
doc_id % sample_mod == 0 (a uniform systematic sample under hashed doc
ids), shard assignment is the shared keyed-md5 routing
(``index/routing.py:route_shard_col``), CSI retrieval is BM25
(k1=1.2, b=0.75, the ln(1 + (N-df+.5)/(df+.5)) idf) computed over
CSI-local statistics, scores rounded before the top-n cut, ties by
doc_id.

Scale shape: the CSI is smaller than the corpus by the sample factor
and is the ONLY thing the query touches — the full corpus contributes
one count per shard (the scale-up numerators), computed once and
broadcast. Per query the work is |top-n| rows. This is exactly why
ReDDE beats broadcasting at 10^12 docs: selection cost is independent
of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.routing import route_shard_col


def redde_shard_scores(
    docs: DataFrame,
    queries: DataFrame,
    n_shards: int = 16,
    sample_mod: int = 4,
    top_n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, rank, shard, est_rel, share): shards ranked per query
    by the ReDDE vote mass of the query's top-``top_n`` CSI docs;
    ``est_rel`` is the scaled-up relevant-doc estimate, ``share`` its
    per-query normalization. Shards absent from the top-n get no row
    (they are not routed to)."""
    shards = docs.select(
        F.col(id_col).alias("doc_id"),
        route_shard_col(id_col, n_shards).alias("shard"),
    )
    shard_sizes = shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_s")
    )
    csi_ids = shards.filter(F.col("doc_id") % sample_mod == 0)
    csi_sizes = csi_ids.groupBy("shard").agg(F.count(F.lit(1)).alias("s_s"))

    csi = docs.filter(F.col(id_col) % sample_mod == 0)
    toks = csi.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dstats = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    glob = dstats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tstats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    ).distinct()
    scored = (
        qterms.join(postings, "term")
        .join(tstats, "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(glob))
        .withColumn(
            "__s",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * (1.2 + 1.0)
            / (
                F.col("tf")
                + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("__s"), round_digits).alias("score"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    top = scored.withColumn("__r", F.row_number().over(wq)).filter(
        F.col("__r") <= top_n
    )
    votes = (
        top.join(shards, "doc_id")
        .join(F.broadcast(shard_sizes), "shard")
        .join(F.broadcast(csi_sizes), "shard")
        .groupBy("query_id", "shard")
        .agg(F.sum(F.col("n_s") / F.col("s_s")).alias("est"))
    )
    wt = Window.partitionBy("query_id")
    ws = Window.partitionBy("query_id").orderBy(
        F.round(F.col("est"), round_digits).desc(), F.col("shard").asc()
    )
    return (
        votes.withColumn("__tot", F.sum("est").over(wt))
        .withColumn("rank", F.row_number().over(ws))
        .select(
            "query_id",
            "rank",
            "shard",
            F.round("est", round_digits).alias("est_rel"),
            F.round(F.col("est") / F.col("__tot"), round_digits).alias(
                "share"
            ),
        )
    )
