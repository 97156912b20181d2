"""Champion-list (top-docs) inexact retrieval audit.

Manning, Raghavan & Schütze, "Introduction to Information Retrieval",
§7.1.3: precompute for every term its CHAMPION LIST — the r documents
with the highest term weight (here: tf, the static part of BM25's
saturation; ties to the smaller doc id) — and answer queries over the
UNION of the query terms' champion lists instead of their full
postings.  The classic speed/recall trade for head queries: candidate
count drops from Σ df to ≤ r·|q|, and the k results are exact
whenever the true top-k happens to live inside the champion union.

This audit quantifies that trade on the real corpus per reference
query: candidates examined under champions vs full evaluation, top-k
overlap, and whether the top-1 survives — the empirical basis for
choosing r (IIR's guidance: r >> k for safety).

Scoring of the candidate set uses CORPUS-GLOBAL statistics (idf, dl,
avgdl over the whole collection) — pruning changes which docs are
scored, never how; same division as the static-pruning audit
(``index/pruning.py``).

Scale shape: the champion list is a per-term rank window over
postings (the same (term)-keyed shuffle the segment writer uses), the
candidate union is a semi-join, and both rankings share one scoring
plan.  No UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def champion_audit(
    docs: DataFrame,
    queries: DataFrame,
    r: int = 20,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Per query: (query_id, n_candidates, n_full, topk_overlap,
    top1_match, candidate_frac)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("term"),
    )
    wt = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    champs = postings.withColumn("cr", F.row_number().over(wt)).filter(
        F.col("cr") <= r
    ).select("term", "doc_id")

    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = F.col("tf") * (1.2 + 1.0) / (
        F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    )

    def score(match):  # matched (query_id, term, doc_id, tf) relation
        return (
            match.join(df_t, "term")
            .join(dstats, "doc_id")
            .crossJoin(F.broadcast(globals_))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(idf * sat).alias("s"))
        )

    full_match = qterms.join(postings, "term")
    cand_ids = (
        qterms.join(champs, "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    cand_match = full_match.join(
        cand_ids, ["query_id", "doc_id"], "left_semi"
    )

    def topk(scored):
        w = Window.partitionBy("query_id").orderBy(
            F.round(F.col("s"), round_digits).desc(), F.col("doc_id").asc()
        )
        return scored.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= k
        )

    full_top = topk(score(full_match))
    cand_top = topk(score(cand_match))
    counts = (
        full_match.select("query_id", "doc_id").distinct()
        .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_full"))
        .join(
            cand_ids.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("n_candidates")
            ),
            "query_id",
        )
    )
    overlap = (
        full_top.select("query_id", "doc_id", "rk")
        .join(
            cand_top.select("query_id", "doc_id"),
            ["query_id", "doc_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("topk_overlap"),
            F.max((F.col("rk") == 1).cast("int")).alias("top1_match"),
        )
    )
    return (
        counts.join(overlap, "query_id", "left")
        .select(
            "query_id",
            "n_candidates",
            "n_full",
            F.coalesce("topk_overlap", F.lit(0)).cast("long").alias(
                "topk_overlap"
            ),
            F.coalesce("top1_match", F.lit(0)).cast("int").alias(
                "top1_match"
            ),
            F.round(
                F.col("n_candidates") / F.col("n_full"), round_digits
            ).alias("candidate_frac"),
        )
    )
