"""Group Varint coding of posting-list doc-id gaps — exact byte-cost
audit vs the live delta+varint codec.

Dean, "Challenges in Building Large-Scale Information Retrieval
Systems" (WSDM 2009 keynote, the Google web-index codec): classic
VByte spends a continuation bit per byte, so decoding branches on
every byte.  Group Varint instead packs FOUR integers per group: one
leading tag byte carries four 2-bit lengths, then each integer is
stored in its minimal 1-4 whole bytes — a decoder reads the tag,
looks up a 256-entry shuffle table, and emits 4 integers with no
branches (the same out-of-band-lengths idea Stream VByte — our
``svb.py`` — later batched into separate streams).

Exact cost per group of n<=4 gaps:

    group_bytes = 1 (tag) + sum over gaps of data_len(g),
    data_len(g) = 1,2,3,4 for g < 2^8, 2^16, 2^24, else

versus LEB128's 1 byte per 7 payload bits.  Head terms with sub-128
gaps pay the tag (0.25 B/int amortized, same as Stream VByte's
control stream); gaps in [2^14, 2^16) save a data byte.  A short
final group (n % 4 != 0) still pays a full tag byte — counted
exactly here, the detail size estimates usually wave away.

Scale shape: identical to every codec audit in this package — one
(term)-partitioned lag window for gaps, one row_number to cut groups
of 4, projection arithmetic, one hash aggregate; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len
from tokenkit_spark.index.svb import svb_data_len


def gvarint_audit(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    k: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Exact Group Varint byte cost (tag bytes + minimal data bytes,
    groups of 4) per term vs the live delta+varint stream, for the
    top-``k`` largest doc-id sets: (rank, term, n_docs, gv_data_bytes,
    gv_tag_bytes, gv_bytes, varint_bytes, bpp_gv, bpp_varint, ratio),
    ranked by (n_docs desc, term asc)."""
    p = postings.select(
        F.col(term_col).alias("term"), F.col(id_col).alias("id")
    ).distinct()
    wt = Window.partitionBy("term").orderBy("id")
    gap = F.col("id") - F.coalesce(F.lag("id").over(wt), F.lit(0))
    g = p.withColumn("gap", gap).select(
        "term",
        svb_data_len(F.col("gap")).alias("data_b"),
        varint_len(F.col("gap")).alias("varint_b"),
    )
    agg = g.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("data_b").alias("gv_data_bytes"),
        F.sum("varint_b").alias("varint_bytes"),
    )
    tag = F.ceil(F.col("n_docs") / F.lit(4.0)).cast("long")
    sized = (
        agg.withColumn("gv_tag_bytes", tag)
        .withColumn(
            "gv_bytes", F.col("gv_data_bytes") + F.col("gv_tag_bytes")
        )
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("term").asc())
    return (
        sized.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "n_docs",
            "gv_data_bytes",
            "gv_tag_bytes",
            "gv_bytes",
            "varint_bytes",
            F.round(F.col("gv_bytes") / F.col("n_docs"), round_digits).alias(
                "bpp_gv"
            ),
            F.round(
                F.col("varint_bytes") / F.col("n_docs"), round_digits
            ).alias("bpp_varint"),
            F.round(
                F.col("gv_bytes") / F.col("varint_bytes"), round_digits
            ).alias("ratio"),
        )
    )
