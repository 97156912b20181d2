"""MinDist proximity re-ranking (Tao & Zhai, "An Exploration of
Proximity Measures in Information Retrieval", SIGIR 2007).

Of the five span/distance aggregates the paper studies, the winner —
robust across collections — is MinDist: the smallest position distance
between any pair of DISTINCT matched query terms in the document,
folded into the retrieval score as a saturating bonus

    R(Q,D) = BM25(Q,D) + ln( alpha + exp(-MinDist(Q,D)) )

so adjacent terms (MinDist=1) earn ~ln(alpha + 0.37) and far-apart
terms decay toward the constant ln(alpha) — a rank-neutral floor for
docs where fewer than two distinct query terms occur (MinDist is then
the ``cap`` sentinel and exp underflows to 0 on both engines).

Pipeline shape (the standard two-stage proximity design — the same
store-and-reanalyze pattern as the rescorer and MaxP):

1. stage 1: plain relational BM25 over (tf, dl, df) stats, per-query
   top-``depth`` candidates (depth=50) — WAND/MAXSCORE-prunable at
   scale since it is the stock scoring plan;
2. stage 2: positional pass restricted to the candidate (query, doc)
   pairs by a semi-join, pairwise min distance via a position
   self-join co-partitioned on (query_id, doc_id) — per-doc work is
   bounded by that doc's matched-occurrence count, never corpus-sized;
3. final top-``k`` window over round(bm25 + bonus).

No UDFs; positions come from posexplode and never leave the (query,
doc) key.  Reference contract: the paper's Eq. (6) MinDist and the
alpha=0.3 setting its experiments pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.bm25f import _topk


def mindist_rerank(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    alpha: float = 0.3,
    depth: int = 50,
    cap: int = 1000,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k MinDist-boosted BM25: (query_id, rank, doc_id, mindist,
    score); ``queries``: (query_id, text)."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    ptoks = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos", "term")
    ).withColumn("pos", F.col("pos") + 1)
    postings = ptoks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dstats = ptoks.groupBy("doc_id").agg(F.count("*").alias("dl"))
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
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = F.col("tf") * (k1 + 1.0) / (
        F.col("tf")
        + F.lit(float(k1))
        * (1.0 - b + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
    )
    bm25 = (
        qterms.join(postings, "term")
        .join(df_t, "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * sat).alias("bm25"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round(F.col("bm25"), round_digits).desc(), F.col("doc_id").asc()
    )
    cand = bm25.withColumn("crank", F.row_number().over(wq)).filter(
        F.col("crank") <= depth
    ).drop("crank")
    # stage 2: matched positions only for candidate pairs
    mpos = qterms.join(ptoks, "term").join(
        cand.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi"
    )
    a, c = mpos.alias("a"), mpos.alias("c")
    pairs = a.join(
        c,
        (F.col("a.query_id") == F.col("c.query_id"))
        & (F.col("a.doc_id") == F.col("c.doc_id"))
        & (F.col("a.term") < F.col("c.term")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        F.col("a.doc_id").alias("doc_id"),
        F.abs(F.col("a.pos") - F.col("c.pos")).alias("d"),
    )
    md = pairs.groupBy("query_id", "doc_id").agg(F.min("d").alias("mindist"))
    scored = (
        cand.join(md, ["query_id", "doc_id"], "left")
        .withColumn(
            "mindist", F.coalesce("mindist", F.lit(int(cap))).cast("long")
        )
        .withColumn(
            "score",
            F.col("bm25")
            + F.log(F.lit(float(alpha)) + F.exp(-F.col("mindist"))),
        )
    )
    ranked = _topk(scored.select("query_id", "doc_id", "score"), k,
                   round_digits)
    return ranked.join(
        scored.select("query_id", "doc_id", "mindist"),
        ["query_id", "doc_id"],
    ).select("query_id", "rank", "doc_id", "mindist", "score")
