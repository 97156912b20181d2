"""Static index pruning with a retrieval-quality audit.

Carmel et al., "Static Index Pruning for Information Retrieval
Systems" (SIGIR 2001): drop low-impact postings at INDEX time so the
served index is a fraction of the full one, accepting a bounded
top-k quality loss.  The term-centric variant kept here retains, per
term, only the ``keep_per_term`` highest-impact postings (rank by tf
desc, doc_id asc — deterministic), while SCORING statistics (df, dl,
avgdl, N) stay those of the FULL corpus, so surviving postings score
identically to the unpruned index and ranking differences come only
from dropped candidates — the standard static-pruning contract.

``static_prune_eval`` runs the same BM25 top-k through the full and
the pruned posting relation and reports per-query result-set overlap
(the symmetric-difference quality metric from the paper), which makes
the pruning/quality trade measurable per corpus rather than assumed.

Scale shape: pruning is ONE window (rank over term partitions) on the
posting relation — the same (term)-keyed shuffle the df aggregate
already pays; the audit adds a second scoring pass over the strictly
smaller pruned relation plus a (query_id, doc_id) equi-join of two
top-k sets (k rows per query each).  No UDFs, no driver state.  At
10^12 docs the head terms' windows are the skew concern; rank-within-
term parallelizes per term and AQE splits oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.bm25f import _toks, _topk


def _bm25_over(qterms, postings, df_t, dstats, globals_, k1, b, k,
               round_digits):
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (1.0 - b + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        qterms.join(postings, "term")
        .join(df_t, "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * sat).alias("score"))
    )
    return _topk(scored, k, round_digits)


def prune_postings(postings: DataFrame, keep_per_term: int) -> DataFrame:
    """Keep the ``keep_per_term`` highest-tf postings per term
    (tf desc, doc_id asc — deterministic)."""
    w = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    return (
        postings.withColumn("__pr", F.row_number().over(w))
        .filter(F.col("__pr") <= keep_per_term)
        .drop("__pr")
    )


def static_prune_eval(
    docs: DataFrame,
    queries: DataFrame,
    keep_per_term: int = 8,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """(query_id, n_full, n_pruned, overlap, overlap_frac): BM25 top-k
    agreement between the full index and the term-centric pruned one.
    ``queries``: (query_id, text), whitespace-lowercase analyzed."""
    toks = _toks(docs, id_col, text_col).withColumnRenamed(id_col, "doc_id")
    postings = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
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
    full = _bm25_over(
        qterms, postings, df_t, dstats, globals_, k1, b, k, round_digits
    )
    pruned = _bm25_over(
        qterms, prune_postings(postings, keep_per_term), df_t, dstats,
        globals_, k1, b, k, round_digits,
    )
    f = full.groupBy("query_id").agg(
        F.count("*").alias("n_full"),
        F.collect_set("doc_id").alias("__fd"),
    )
    p = pruned.groupBy("query_id").agg(
        F.count("*").alias("n_pruned"),
        F.collect_set("doc_id").alias("__pd"),
    )
    return (
        f.join(p, "query_id")
        .select(
            "query_id",
            "n_full",
            "n_pruned",
            F.size(F.array_intersect("__fd", "__pd")).cast("long")
            .alias("overlap"),
            F.round(
                F.size(F.array_intersect("__fd", "__pd"))
                / F.greatest(F.col("n_full"), F.lit(1)),
                4,
            ).alias("overlap_frac"),
        )
    )
