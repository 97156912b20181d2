"""Suffix-tree-clustering-style result grouping — phrase base
clusters over the top-k.

Zamir & Etzioni, "Web document clustering: a feasibility
demonstration" (SIGIR 1998): cluster SEARCH RESULTS (not the corpus)
by the phrases they share — a base cluster is a phrase plus the set
of result docs containing it, scored s(B) = |B| * f(|P|) with f the
phrase-length credit; overlapping base clusters are then merged.
This implementation materializes the base-cluster layer for the
BM25-style top-k of each query, using word n-grams (2..3) as the
phrase inventory (the flat relational stand-in for the suffix tree —
identical base clusters for phrases up to the gram cap), phrase
credit f(|P|) = |P| capped at 3 per the paper, singleton-stopword
phrases excluded by the >= 2-doc support gate.

Returns the top-``n_clusters`` base clusters per query by
(score desc, phrase asc): (query_id, rank, phrase, n_docs, score).

Scale shape: candidate docs are k per query; gram explosion is per
top-doc text (bounded by k * doc length); everything after is
(query, phrase)-keyed hash aggregation.  The suffix tree's linear-
time elegance matters on one machine; the gram relation IS the
distributed formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stc_base_clusters(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 5,
    min_support: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(id_col).distinct().count()
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(df_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(F.lit(1.0) + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("score")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    top = (
        scored.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= k)
        .select("query_id", "doc_id")
    )
    # word 2-3 grams of the top docs; 0-based F.get + in-lambda bound
    # guards (ANSI element_at would throw at the array edge, and
    # sequence(1, 0) descends)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)))
    two = F.transform(
        idx,
        lambda i: F.when(
            i + 1 < F.size(words),
            F.concat_ws(" ", F.get(words, i), F.get(words, i + 1)),
        ),
    )
    three = F.transform(
        idx,
        lambda i: F.when(
            i + 2 < F.size(words),
            F.concat_ws(
                " ",
                F.get(words, i),
                F.get(words, i + 1),
                F.get(words, i + 2),
            ),
        ),
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.concat(two, three), lambda g: g.isNotNull()
                )
            )
        ).alias("phrase"),
    )
    base = (
        top.join(grams, "doc_id")
        .groupBy("query_id", "phrase")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_support)
        .withColumn(
            "score",
            F.col("n_docs")
            * F.least(
                F.size(F.split(F.col("phrase"), " ")), F.lit(3)
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        base.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= n_clusters)
        .select("query_id", "rank", "phrase", "n_docs", "score")
    )
