"""LexRank extractive summarization, fully relational.

Erkan & Radev, "LexRank: Graph-based Lexical Centrality as Salience in
Text Summarization" (JAIR 22, 2004) — the thresholded variant the
paper headlines: sentences of a document are nodes, an edge connects
sentences whose tf-idf-modified cosine

    cos(x, y) = sum_t tf_x(t) tf_y(t) idf(t)^2
                / ( ||tf_x . idf|| * ||tf_y . idf|| )

reaches ``threshold``; salience is the stationary distribution of a
random walk on that (binary, undirected) graph with uniform teleport:

    p(u) = d / N  +  (1 - d) * sum_{v adj u} p(v) / deg(v)

(the paper's eq. 4, d = 0.15).  idf here is ln(N_sent / sdf) over the
CORPUS sentence collection (the paper computes idf on the background
corpus).  Degree-0 sentences keep only the teleport mass (no dangling
redistribution — stated, and mirrored exactly by the oracle twin).

The operator takes a ``sentences`` relation (doc_id, sent_id, text) so
sentence segmentation is the caller's contract (analyzers/segmentation
for punctuated prose; fixed-width chunking for the synthetic corpus).

Scale shape: the similarity join is keyed by (doc_id, term) and every
pair computation is confined within one document's sentence set —
corpus-wide work is one idf aggregate.  Each power iteration is one
join of the per-doc adjacency with the score vector + a groupBy (the
PageRank shape), with localCheckpoint cutting lineage per round.
A 10^12-sentence corpus shuffles on (doc) and (doc, term) keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lexrank(
    sentences: DataFrame,
    threshold: float = 0.1,
    teleport: float = 0.15,
    iterations: int = 4,
    k: int = 2,
    doc_col: str = "doc_id",
    sent_col: str = "sent_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, rank, sent_id, score): top-``k`` salient sentences per
    doc after ``iterations`` LexRank power iterations."""
    tf = (
        sentences.select(
            doc_col,
            sent_col,
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("term"),
        )
        .groupBy(doc_col, sent_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_sent = sentences.select(doc_col, sent_col).distinct().count()
    sdf = tf.groupBy("term").agg(
        F.countDistinct(doc_col, sent_col).alias("sdf")
    )
    w = tf.join(sdf, "term").select(
        doc_col,
        sent_col,
        "term",
        (F.col("tf") * F.log(F.lit(float(n_sent)) / F.col("sdf"))).alias(
            "wt"
        ),
    )
    norms = w.groupBy(doc_col, sent_col).agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("norm")
    )
    # within-doc pairwise cosine over shared terms
    dots = (
        w.alias("x")
        .join(
            w.alias("y"),
            (F.col(f"x.{doc_col}") == F.col(f"y.{doc_col}"))
            & (F.col("x.term") == F.col("y.term"))
            & (F.col(f"x.{sent_col}") != F.col(f"y.{sent_col}")),
        )
        .groupBy(
            F.col(f"x.{doc_col}").alias(doc_col),
            F.col(f"x.{sent_col}").alias("s_a"),
            F.col(f"y.{sent_col}").alias("s_b"),
        )
        .agg(F.sum(F.col("x.wt") * F.col("y.wt")).alias("dot"))
    )
    adj = (
        dots.join(
            norms.select(
                doc_col, F.col(sent_col).alias("s_a"),
                F.col("norm").alias("na"),
            ),
            [doc_col, "s_a"],
        )
        .join(
            norms.select(
                doc_col, F.col(sent_col).alias("s_b"),
                F.col("norm").alias("nb"),
            ),
            [doc_col, "s_b"],
        )
        .filter(
            F.col("dot") / (F.col("na") * F.col("nb")) >= threshold
        )
        .select(doc_col, "s_a", "s_b")
        .localCheckpoint()
    )
    deg = adj.groupBy(doc_col, F.col("s_b").alias(sent_col)).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nodes = sentences.select(doc_col, sent_col).distinct()
    n_d = nodes.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n_d"))
    p = nodes.join(n_d, doc_col).select(
        doc_col, sent_col, (F.lit(1.0) / F.col("n_d")).alias("p")
    )
    for _ in range(iterations):
        flow = (
            p.join(deg, [doc_col, sent_col])
            .join(
                adj.select(
                    doc_col, F.col("s_b").alias(sent_col),
                    F.col("s_a").alias("to_sent"),
                ),
                [doc_col, sent_col],
            )
            .groupBy(doc_col, F.col("to_sent").alias(sent_col))
            .agg(F.sum(F.col("p") / F.col("deg")).alias("inflow"))
        )
        p = (
            nodes.join(n_d, doc_col)
            .join(flow, [doc_col, sent_col], "left")
            .select(
                doc_col,
                sent_col,
                (
                    F.lit(teleport) / F.col("n_d")
                    + F.lit(1.0 - teleport)
                    * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("p"),
            )
            .localCheckpoint()
        )
    wnd = Window.partitionBy(doc_col).orderBy(
        F.round("p", round_digits).desc(), F.col(sent_col).asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(wnd).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            doc_col, "rank", sent_col,
            F.round("p", round_digits).alias("score"),
        )
    )
