"""Lucene CommonTermsQuery — automatic stopword handling at query
time, without a stopword list.

Lucene's ``CommonTermsQuery`` (the engine behind Elasticsearch's
``common`` terms query and the ``cutoff_frequency`` option of
``match``): split the query's terms by DOCUMENT FREQUENCY at a cutoff
ratio — terms with df/N above the cutoff are "common" (they match
almost everything and carry little signal), the rest are "rare".
Rare terms form the REQUIRED conjunction that drives retrieval;
common terms are optional SHOULD clauses that only contribute
scoring.  A query that is ALL common terms degrades to a plain
disjunction (otherwise "to be or not to be" would return nothing).
This buys stopword robustness without a curated list and without
paying the full postings cost of head terms in the match set — the
head lists are only intersected against the (small) rare-term result,
the same asymmetry ``intersect.py`` measures.

Scoring is the ordinary BM25 sum over ALL matched query terms
(common terms score when present; they just don't gate the match) —
rank-identical to Lucene's SHOULD-over-matched semantics for a
top-k under a fixed candidate set.

Scale shape: the term split is a broadcast of the query terms against
the term-stats table; candidate generation joins ONLY the rare
postings; the common postings join lands on the candidate set, not
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.lmsim import _relations


def common_terms_search(
    docs: DataFrame,
    queries: DataFrame,
    cutoff: float = 0.3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """(query_id, rank, doc_id, n_rare_hit, score): BM25 top-k where
    docs must contain ALL rare query terms (df/N <= cutoff); if the
    query has no rare terms, all its terms are optional."""
    qterms, postings, dstats, tstats, globals_ = _relations(
        docs, queries, id_col, text_col
    )
    tagged = (
        qterms.join(tstats, "term")
        .crossJoin(F.broadcast(globals_))
        .select(
            "query_id",
            "term",
            (
                F.col("df") / F.col("n_docs") > cutoff
            ).alias("is_common"),
        )
    )
    n_rare = tagged.groupBy("query_id").agg(
        F.sum((~F.col("is_common")).cast("long")).alias("n_rare")
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w_term = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tagged.join(postings, "term")
        .join(tstats, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(
            F.sum(w_term).alias("score"),
            F.sum((~F.col("is_common")).cast("long")).alias(
                "n_rare_hit"
            ),
        )
    )
    gated = scored.join(F.broadcast(n_rare), "query_id").filter(
        F.col("n_rare_hit") == F.col("n_rare")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", round_digits).desc(), F.col(id_col).asc()
    )
    return (
        gated.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col(id_col).alias("doc_id"),
            "n_rare_hit",
            F.round("score", round_digits).alias("score"),
        )
    )
