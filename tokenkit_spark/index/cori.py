"""CORI resource selection: which shards should a query even visit?

At 10^12 docs the index is hundreds of shards, and broadcasting every
query to every shard wastes the fleet on shards that cannot contribute
to the top-k. CORI (Callan, Lu & Croft, "Searching distributed
collections with inference networks", SIGIR 1995) ranks COLLECTIONS for
a query from collection-level statistics only — document frequency per
shard and shard vocabulary mass — so the broker can route each query to
its best-m shards. It is the classical federated-search selector the
later ones (ReDDE, Taily) are measured against.

Per term t and shard s (C = number of shards):

    T = df_{t,s} / (df_{t,s} + 50 + 150 * cw_s / avg_cw)
    I = ln((C + 0.5) / cf_t) / ln(C + 1.0)
    belief(t|s) = b + (1 - b) * T * I          (b = 0.4)

where cw_s is shard s's token count, cf_t the number of shards whose
vocabulary contains t, and a term absent from a shard contributes the
default belief b. The query's shard score is the mean belief over its
distinct analyzed terms.

Scale shape: the selector input is a (term, shard) statistics table —
vocabulary x shards, NOT corpus-sized — built in one distinct + two
hash aggs over the postings relation, reusable across every query. Per
query the work is |q| x C rows. Nothing collects to the driver. Shard
assignment uses the same keyed-md5 routing as
index/routing.py:route_shard_col, so the audit and the selector see the
same layout, and the DuckDB oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.routing import route_shard_col


def shard_term_stats(
    docs: DataFrame,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "route",
) -> tuple[DataFrame, DataFrame]:
    """(per-(shard, term) df table, per-shard cw table) for the CORI
    formula, from one tokenize pass."""
    toks = docs.select(
        route_shard_col(id_col, n_shards, salt).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    df_ts = (
        toks.select("shard", "doc_id", "term")
        .distinct()
        .groupBy("shard", "term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    cw = toks.groupBy("shard").agg(F.count(F.lit(1)).alias("cw"))
    return df_ts, cw


def cori_shard_scores(
    docs: DataFrame,
    queries: DataFrame,
    n_shards: int = 16,
    b: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "route",
    round_digits: int = 6,
) -> DataFrame:
    """Rank every shard for every query by mean CORI belief. Returns
    (query_id, rank, shard, cori_score) — rank 1 is the shard the
    broker dispatches to first; a cutoff at rank m is the selective
    routing policy. Rank is computed over the ROUNDED score (shard asc
    tiebreak) so it is engine-stable."""
    df_ts, cw = shard_term_stats(docs, n_shards, text_col, id_col, salt)
    avg_cw = cw.agg(F.avg("cw").alias("avg_cw"))
    cf = df_ts.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("term"),
    ).distinct()
    # full (query term) x (shard) grid: absent terms must still pay the
    # default belief b, or sparse shards would win on missing evidence
    grid = qterms.crossJoin(F.broadcast(cw.select("shard", "cw")))
    c_total = float(n_shards)
    stats = (
        grid.join(df_ts, ["shard", "term"], "left")
        .join(F.broadcast(cf), "term", "left")
        .crossJoin(F.broadcast(avg_cw))
    )
    t_part = F.when(
        F.col("df").isNotNull(),
        F.col("df")
        / (F.col("df") + 50.0 + 150.0 * F.col("cw") / F.col("avg_cw")),
    ).otherwise(F.lit(0.0))
    i_part = F.when(
        F.col("cf").isNotNull(),
        F.log((F.lit(c_total) + 0.5) / F.col("cf"))
        / F.log(F.lit(c_total) + 1.0),
    ).otherwise(F.lit(0.0))
    belief = F.lit(b) + F.lit(1.0 - b) * t_part * i_part
    scored = (
        stats.select("query_id", "shard", belief.alias("belief"))
        .groupBy("query_id", "shard")
        .agg(F.round(F.avg("belief"), round_digits).alias("cori_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cori_score").desc(), F.col("shard").asc()
    )
    return scored.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "shard",
        "cori_score",
    )
