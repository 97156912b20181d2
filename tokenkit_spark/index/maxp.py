"""BM25-MaxP: passage-level scoring with max-pooling to the document.

Dai & Callan ("Deeper text understanding for IR with contextual neural
language modeling", SIGIR 2019) popularized MaxP for long documents:
score fixed-size overlapping PASSAGES as the retrieval units, then let
each document inherit its best passage's score. For web pages this
fixes the classic long-doc failure of whole-doc BM25 — a 10k-token page
with one densely relevant section is a top hit to a human but its tf is
diluted by length normalization; passage scoring restores the local
evidence, and the overlap (stride < window) guarantees no relevant
span straddles a boundary unseen.

Passage grid: window ``w`` tokens, stride ``s``; passage count per doc

    n_pass = 1 + ceil(max(0, n_tokens - w) / s)

(start offsets 1, 1+s, 1+2s, ... — the last passage may overrun the end
and is simply shorter), which covers every token whenever s <= w.
Passages are the BM25 corpus: df counts passages containing the term,
length norm uses passage length and the passage-average dl. Document
score = max over its passages (ties: lowest passage index).

Scale shape: passage explosion is a deterministic flat-map (sequence +
slice, pure Catalyst — no UDF), multiplying the postings relation by
~w/s (2x at the defaults), after which the plan IS the ordinary BM25
plan. Max-pooling is one extra window over (query, doc). At 10^12 docs
the passage index is what you'd materialize anyway for
passage-granular retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def passage_tokens(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 30,
    stride: int = 15,
) -> DataFrame:
    """(doc_id, pidx, term): lowercase-whitespace tokens of every
    overlapping passage. A token inside an overlap region appears once
    per covering passage — that IS the passage corpus."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    n = F.size(toks)
    n_pass = (
        F.lit(1)
        + F.ceil(
            F.greatest(F.lit(0), n - F.lit(window)) / F.lit(float(stride))
        )
    ).cast("int")
    w = docs.select("doc_id", toks.alias("toks"), n_pass.alias("n_pass"))
    p = w.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_pass") - 1)).alias("pidx"),
        "toks",
    )
    return p.select(
        "doc_id",
        "pidx",
        F.explode(
            F.slice(
                F.col("toks"), F.col("pidx") * stride + 1, F.lit(window)
            )
        ).alias("term"),
    )


def maxp_top_k(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    window: int = 30,
    stride: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query under passage-BM25 max pooling.
    Returns (query_id, rank, doc_id, best_pidx, score) — score is the
    best passage's BM25 (4-dp), best_pidx that passage's index (lowest
    wins ties), rank over (4-dp score desc, doc_id asc)."""
    ptok = passage_tokens(docs, text_col, window, stride)
    postings = ptok.groupBy("doc_id", "pidx", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    pstats = ptok.groupBy("doc_id", "pidx").agg(
        F.count(F.lit(1)).alias("pdl")
    )
    g = pstats.agg(
        F.count(F.lit(1)).alias("n_pass"), F.avg("pdl").alias("avgdl")
    )
    tstats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("term"),
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_pass") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("pdl") / F.col("avgdl")))
    )
    scored = (
        qterms.join(postings, "term")
        .join(tstats, "term")
        .join(pstats, ["doc_id", "pidx"])
        .crossJoin(F.broadcast(g))
        .groupBy("query_id", "doc_id", "pidx")
        .agg(F.round(F.sum(idf * norm), 4).alias("pscore"))
    )
    wdoc = Window.partitionBy("query_id", "doc_id").orderBy(
        F.col("pscore").desc(), F.col("pidx").asc()
    )
    best = (
        scored.withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "doc_id",
            F.col("pidx").cast("long").alias("best_pidx"),
            F.col("pscore").alias("score"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        best.withColumn("rank", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "best_pidx", "score")
    )
