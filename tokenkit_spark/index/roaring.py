"""Roaring-bitmap container sizing for posting doc-id sets.

Chambi, Lemire, Kaser & Godin, "Better bitmap performance with Roaring
bitmaps" (Software: Practice & Experience 2016) and Lemire et al.,
"Consistently faster and smaller compressed bitmaps with Roaring"
(2016, run containers).  Lucene stores live-docs / doc-id sets in a
roaring-style format; this module answers the index-design question
"what would each term's doc-id set cost under Roaring vs the live
delta+varint codec?" as an exact byte-level A/B, the same shape as the
docID-assignment A/B in ``index/reorder.py``.

Container rules (the published format, per 2^16-value chunk):

* array container  — 2 bytes/value, only legal when cardinality <= 4096
* bitmap container — fixed 8192 bytes (2^16 bits)
* run container    — 2 + 4*n_runs bytes (16-bit run count, 16-bit
  start + 16-bit length per run); chosen by ``runOptimize``'s rule —
  when it is strictly smaller than the best of the other two.

Serialized size counts the portable-format fixed parts deterministically:
8 bytes of header (cookie + container count) per bitmap and a 4-byte
(key, cardinality-1) descriptor per container; the optional offset
index is omitted on both sides of the A/B (documented simplification —
it is a constant 4 bytes/container when present and changes no
comparison).

Scale shape: everything is one (term, chunk)-keyed window (run
detection via ``lag``) plus two hash aggregates riding the same
term-keyed shuffle the segment writer already pays.  No UDFs, no
driver-side data; head-term skew lands in per-(term, chunk) windows
which subdivide head terms across chunks at real id widths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len


def roaring_term_sizes(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-term exact Roaring size vs delta+varint size of the doc-id
    set.

    Input: one row per (term, doc_id), ids unique per term.
    Output: (term, n_docs, n_containers, n_array, n_bitmap, n_run,
    roaring_bytes, varint_bytes) — roaring_bytes includes the 8-byte
    header + 4 bytes/container descriptors; varint_bytes is the live
    codec's convention (first posting absolute, then gaps;
    index/reorder.py:varint_len).
    """
    p = postings.select(
        F.col(term_col).alias("term"), F.col(id_col).cast("long").alias("id")
    ).distinct()
    p = p.withColumn("chunk", (F.col("id") / F.lit(65536)).cast("long"))

    wc = Window.partitionBy("term", "chunk").orderBy("id")
    runs = p.withColumn(
        "run_start",
        F.when(
            F.col("id") - F.coalesce(F.lag("id").over(wc), F.lit(-2)) != 1, 1
        ).otherwise(0),
    )
    per_chunk = runs.groupBy("term", "chunk").agg(
        F.count("*").alias("n"), F.sum("run_start").alias("n_runs")
    )
    base_bytes = F.when(F.col("n") <= 4096, 2 * F.col("n")).otherwise(
        F.lit(8192)
    )
    run_bytes = 2 + 4 * F.col("n_runs")
    chunk_sized = per_chunk.select(
        "term",
        "n",
        F.when(run_bytes < base_bytes, F.lit("run"))
        .when(F.col("n") <= 4096, F.lit("array"))
        .otherwise(F.lit("bitmap"))
        .alias("kind"),
        (F.least(run_bytes, base_bytes) + F.lit(4)).alias("container_bytes"),
    )
    roaring = chunk_sized.groupBy("term").agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_containers"),
        F.sum(F.when(F.col("kind") == "array", 1).otherwise(0)).alias("n_array"),
        F.sum(F.when(F.col("kind") == "bitmap", 1).otherwise(0)).alias(
            "n_bitmap"
        ),
        F.sum(F.when(F.col("kind") == "run", 1).otherwise(0)).alias("n_run"),
        (F.sum("container_bytes") + F.lit(8)).alias("roaring_bytes"),
    )

    wt = Window.partitionBy("term").orderBy("id")
    gap = F.col("id") - F.coalesce(F.lag("id").over(wt), F.lit(0))
    varint = (
        p.withColumn("__b", varint_len(gap))
        .groupBy("term")
        .agg(F.sum("__b").alias("varint_bytes"))
    )
    return roaring.join(varint, "term")


def roaring_audit(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-``k`` terms by doc-set size with their Roaring-vs-varint
    byte A/B: (rank, term, n_docs, n_containers, n_array, n_bitmap,
    n_run, roaring_bytes, varint_bytes, ratio).  Rank order is
    (n_docs desc, term asc) — deterministic under ties."""
    sized = roaring_term_sizes(postings, term_col, id_col)
    w = Window.orderBy(F.col("n_docs").desc(), F.col("term").asc())
    return (
        sized.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "n_docs",
            "n_containers",
            "n_array",
            "n_bitmap",
            "n_run",
            "roaring_bytes",
            "varint_bytes",
            F.round(
                F.col("roaring_bytes") / F.col("varint_bytes"), 4
            ).alias("ratio"),
        )
    )
