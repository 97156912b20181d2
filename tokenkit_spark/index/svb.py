"""Stream-VByte coding of posting-list doc-id gaps — exact byte-cost
audit vs the live delta+varint codec.

Lemire, Kurz & Rupp, "Stream VByte: Faster Byte-Oriented Integer
Compression" (Information Processing Letters 2018): classic VByte
(LEB128, our live codec — ``index/codec.py``) interleaves continuation
bits with data, so decoding is a branchy byte-at-a-time loop.  Stream
VByte moves the length information out of band: each integer is stored
in 1-4 whole bytes (its minimal big-endian byte length), and a separate
control stream carries 2 bits per integer (4 per control byte) giving
that length — so a SIMD decoder can shuffle 4 integers per lookup with
zero branches.  The price is layout, not entropy:

    data_bytes(g)  = 1,2,3,4  for g < 2^8, 2^16, 2^24, else
    control_bytes  = ceil(n/4)        (2 bits per integer)

versus LEB128's 1 byte per 7 payload bits.  For web-scale posting
lists the trade is measurable in both directions: dense head terms
(gaps < 128) pay the control overhead (0.25 B/int) with no data-byte
win, while mid-range gaps in [2^14, 2^16) save a whole data byte per
posting.  This audit computes the EXACT sizes of both streams per term
over the real corpus so the crossover is empirical, not asserted —
the byte-oriented sibling of the bit-oriented codec audits
(``ef.py``, ``rice.py``, ``pfor.py``, ``bic.py``, ``roaring.py``).

Gap convention matches the live varint stream: gaps over doc ids
sorted ascending, first gap = the doc id itself.

Scale shape: one row_number/lag window per term partition (the shared
(term)-keyed shuffle of every codec audit), pure projection arithmetic,
one hash aggregate; no UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len


def svb_data_len(col) -> F.Column:
    """Bytes the Stream-VByte data stream spends on one gap — its
    minimal whole-byte length (1..4); exact integer thresholds."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c < (1 << 8), 1)
        .when(c < (1 << 16), 2)
        .when(c < (1 << 24), 3)
        .otherwise(4)
        .cast("long")
    )


def svb_audit(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    k: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Exact Stream-VByte byte cost (data + 2-bit control stream) per
    term vs the live delta+varint stream, for the top-``k`` largest
    doc-id sets: (rank, term, n_docs, svb_data_bytes, svb_ctrl_bytes,
    svb_bytes, varint_bytes, bpp_svb, bpp_varint, ratio), ranked by
    (n_docs desc, term asc)."""
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
        F.sum("data_b").alias("svb_data_bytes"),
        F.sum("varint_b").alias("varint_bytes"),
    )
    ctrl = F.ceil(F.col("n_docs") / 4.0).cast("long")
    w = Window.orderBy(F.col("n_docs").desc(), F.col("term").asc())
    return (
        agg.withColumn("svb_ctrl_bytes", ctrl)
        .withColumn(
            "svb_bytes", (F.col("svb_data_bytes") + F.col("svb_ctrl_bytes"))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "n_docs",
            "svb_data_bytes",
            "svb_ctrl_bytes",
            "svb_bytes",
            "varint_bytes",
            F.round(F.col("svb_bytes") / F.col("n_docs"), round_digits).alias(
                "bpp_svb"
            ),
            F.round(
                F.col("varint_bytes") / F.col("n_docs"), round_digits
            ).alias("bpp_varint"),
            F.round(
                F.col("svb_bytes") / F.col("varint_bytes"), round_digits
            ).alias("ratio"),
        )
    )
