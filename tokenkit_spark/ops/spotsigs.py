"""SpotSigs near-duplicate detection — stopword-anchored signatures
with exact Jaccard over an inverted signature index.

Theobald, Siddharth & Paepcke, "SpotSigs: robust and efficient near
duplicate detection in large web crawls" (SIGIR 2008): boilerplate
(navigation, ads) rarely contains natural-language stopwords, so
signatures anchored AT stopword occurrences localize to the article
body and need no layout analysis. A spot signature is the chain of
``chain_len`` non-stopword tokens following each anchor-stopword
occurrence (spot distance 1); a document's signature SET feeds an
exact-Jaccard candidate join.

Unlike MinHash/SimHash (``ops/dedup.py``), SpotSigs is exact —
Jaccard is computed over the true signature sets, so the whole
operator is SQL-expressible and oracle-checkable (no rows-only gap).

Scale shape: tokenization is one posexplode; the chain lookup is the
cumulative-count trick — for every position, c(p) = number of
non-stopwords at positions <= p (one running-sum window per doc), so
the anchor at p chains to the non-stopword sequence numbers c(p)+1
and c(p)+2 — two (doc, seq)-keyed equi-joins, no per-row Python. The
candidate join is the inverted signature index with the same
quadratic-fan-out guard as ngram_jaccard/coclick: signatures shared by
more than ``max_sig_df`` docs are dropped from pairing (boilerplate
chains), bounding the self-join. The paper's partitioning-by-set-size
pruning (|A| >= tau*|B|) is applied as a post-filter on exact sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ANCHORS = ("the", "a", "an", "is", "of", "to", "in", "and")


def spot_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    anchors: tuple = DEFAULT_ANCHORS,
    chain_len: int = 2,
) -> DataFrame:
    """Distinct (doc_id, sig) spot signatures: for every occurrence of
    an anchor stopword, the ':'-joined chain of the next ``chain_len``
    non-stopword tokens (anchors never enter chains; chains shorter
    than ``chain_len`` at document end are dropped)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    is_stop = F.col("tok").isin(*anchors)
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    seqd = toks.withColumn(
        "c", F.sum(F.when(is_stop, 0).otherwise(1)).over(wdoc)
    ).withColumn("stop", is_stop)
    nonstop = seqd.filter(~F.col("stop")).select(
        "doc_id", F.col("c").alias("seq"), F.col("tok").alias("w")
    )
    out = seqd.filter(F.col("stop")).select(
        "doc_id", F.col("c").alias("c0")
    ).alias("a")
    for i in range(1, chain_len + 1):
        nxt = nonstop.alias(f"n{i}")
        out = out.join(
            nxt,
            (F.col("a.doc_id") == F.col(f"n{i}.doc_id"))
            & (F.col(f"n{i}.seq") == F.col("a.c0") + i),
        )
    sig = F.concat_ws(
        ":", *[F.col(f"n{i}.w") for i in range(1, chain_len + 1)]
    )
    return out.select(
        F.col("a.doc_id").alias("doc_id"), sig.alias("sig")
    ).distinct()


def spotsigs_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau: float = 0.4,
    max_sig_df: int | None = 10_000,
    k: int = 20,
    chain_len: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` near-duplicate pairs by exact signature-set Jaccard
    >= ``tau``: (rank, d1, d2, co_sigs, jaccard), rank by
    (jaccard desc, d1, d2)."""
    sigs = spot_signatures(docs, text_col, id_col, chain_len=chain_len)
    sizes = sigs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    paired = sigs
    if max_sig_df is not None:
        keep = (
            sigs.groupBy("sig")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_sig_df)
            .select("sig")
        )
        paired = sigs.join(keep, "sig")
    a = paired.select(F.col("doc_id").alias("d1"), "sig")
    b = paired.select(F.col("doc_id").alias("d2"), "sig")
    inter = (
        a.join(b, "sig")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("co_sigs"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1"), "d1")
        .withColumnRenamed("n", "n1")
        .join(sizes.withColumnRenamed("doc_id", "d2"), "d2")
        .withColumnRenamed("n", "n2")
        .select(
            "d1",
            "d2",
            "co_sigs",
            F.round(
                F.col("co_sigs")
                / (F.col("n1") + F.col("n2") - F.col("co_sigs")),
                round_digits,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )
    w = Window.orderBy(
        F.col("jaccard").desc(), F.col("d1").asc(), F.col("d2").asc()
    )
    return (
        jac.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "d1", "d2", "co_sigs", "jaccard")
    )
