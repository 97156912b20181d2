"""NewPFD (patched frame-of-reference) size audit for posting lists.

PForDelta (Zukowski et al., ICDE 2006; the NewPFD variant of Yan, Ding
& Suel, WWW 2009) is the workhorse doc-id codec of large-scale engines:
fixed 128-gap blocks bit-packed at a width b chosen so ~90% of gaps
fit, with the overflowing "exceptions" patched from a separate array.
Against delta+varint it trades byte-aligned simplicity for SIMD-width
decode; against Elias-Fano it trades optimality on clustered ids for
branch-free unpacking. This audit sizes the repo's real posting lists
under the NewPFD model, next to the live varint codec — the
EF (index/ef.py) and Roaring (index/roaring.py) audits' third sibling,
giving the codec-selection table a complete candidate set.

Model per 128-gap block (last block may be short, n <= 128):

    b          = bit width of the 90th-percentile gap
                 (0-based order statistic floor(0.9 * (n-1)), a
                 DETERMINISTIC discrete quantile — no interpolation, so
                 Spark and the SQL oracle pick the identical element)
    exceptions = gaps >= 2^b, patched at 32 bits each
    block bits = 32 (header: b, count, exception ptr) + n*b + 32*|exc|

Bit widths come from length(bin(gap)) — integer string length, no
float log2 that could flip at exact powers of two.

Scale shape: two windows partitioned by (term[, block]) — the same
per-term sort the segment writer already pays — plus one hash agg; no
UDF, no driver data. Output is vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len

BLOCK = 128


def pfor_term_sizes(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-term NewPFD size vs the live delta+varint codec.

    Input: one row per (term, doc_id), ids unique per term. Output:
    (term, n_docs, n_blocks, n_exceptions, pfor_bytes, varint_bytes).
    Gap convention matches index/reorder.py: first posting absolute
    (gap from 0), then successive differences."""
    p = postings.select(
        F.col(term_col).alias("term"), F.col(id_col).cast("long").alias("id")
    ).distinct()
    wt = Window.partitionBy("term").orderBy("id")
    gaps = p.select(
        "term",
        (F.col("id") - F.coalesce(F.lag("id").over(wt), F.lit(0))).alias(
            "gap"
        ),
        ((F.row_number().over(wt) - 1) / F.lit(BLOCK))
        .cast("long")
        .alias("block"),
    )
    # order statistic floor(0.9*(n-1)) (0-based) inside each block:
    # rank gaps ascending (ties by anything deterministic — gap only is
    # enough since equal gaps give the same width)
    wb = Window.partitionBy("term", "block").orderBy("gap")
    wn = Window.partitionBy("term", "block")
    ranked = gaps.select(
        "term",
        "block",
        "gap",
        F.row_number().over(wb).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    width = (
        F.length(F.bin(F.greatest(F.col("p90"), F.lit(1)))).cast("long")
    )
    blocks = (
        ranked.withColumn(
            "p90",
            F.max(
                F.when(
                    F.col("r")
                    == F.floor(0.9 * (F.col("n") - 1)).cast("long") + 1,
                    F.col("gap"),
                )
            ).over(wn),
        )
        .withColumn("b_width", width)
        .groupBy("term", "block")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("b_width").alias("b_width"),
            F.sum(
                F.when(
                    F.col("gap")
                    >= F.pow(F.lit(2.0), F.col("b_width")).cast("long"),
                    1,
                ).otherwise(0)
            ).alias("n_exc"),
        )
    )
    pfor = blocks.groupBy("term").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n_exc").alias("n_exceptions"),
        (
            (
                F.sum(
                    F.lit(32)
                    + F.col("n") * F.col("b_width")
                    + F.lit(32) * F.col("n_exc")
                )
                + 7
            )
            / 8
        )
        .cast("long")
        .alias("pfor_bytes"),
    )
    varint = (
        p.select(
            "term",
            varint_len(
                F.col("id") - F.coalesce(F.lag("id").over(wt), F.lit(0))
            ).alias("__b"),
        )
        .groupBy("term")
        .agg(F.sum("__b").alias("varint_bytes"))
    )
    return pfor.join(varint, "term")


def pfor_audit(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-``k`` terms by doc-set size with the NewPFD-vs-varint byte
    A/B: (rank, term, n_docs, n_blocks, n_exceptions, pfor_bytes,
    varint_bytes, ratio). Rank order is (n_docs desc, term asc)."""
    sized = pfor_term_sizes(postings, term_col, id_col)
    w = Window.orderBy(F.col("n_docs").desc(), F.col("term").asc())
    return (
        sized.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "n_docs",
            "n_blocks",
            "n_exceptions",
            "pfor_bytes",
            "varint_bytes",
            F.round(F.col("pfor_bytes") / F.col("varint_bytes"), 4).alias(
                "ratio"
            ),
        )
    )
