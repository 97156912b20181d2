"""Elias gamma / delta coding of posting-list doc-id gaps — exact
bit-cost audit vs the live delta+varint codec.

Elias, "Universal codeword sets and representations of the integers"
(IEEE Trans. IT, 1975): gamma codes n >= 1 as unary(floor(log2 n))
then the low bits — 2*floor(log2 n) + 1 bits; delta codes the LENGTH
with gamma first — floor(log2 n) + 2*floor(log2(floor(log2 n)+1)) + 1
bits, asymptotically optimal for power-law gap distributions and the
textbook baseline (Managing Gigabytes §3.2) every parameterized codec
(Golomb-Rice ``rice.py``, zeta ``ops/bvgraph.py``) is judged against.
This is the sixth sibling of the EF/NewPFD/Roaring/BIC/Rice codec
audits, sharing their top-k-largest-lists surface.

Gap convention, stated exactly: Elias codes need n >= 1, and the
corpus contains doc id 0, so gaps here are taken against previous id
-1 (first gap = id + 1, later gaps = id - prev >= 1) — one off the
varint stream's prev=0 convention; the varint column in THIS audit
uses the same +1-shifted gaps so the comparison is apples-to-apples.

Scale shape: one (term)-partitioned row_number window + projection
arithmetic on length(bin(n)) (exact integer bit_length, no float log)
+ one hash aggregate — identical to the Rice audit's plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len


def gamma_bits(n: F.Column) -> F.Column:
    """Bits of Elias gamma for n >= 1: 2*floor(log2 n) + 1."""
    return (2 * (F.length(F.bin(n)) - 1) + 1).cast("long")


def delta_bits(n: F.Column) -> F.Column:
    """Bits of Elias delta for n >= 1: with L = bit_length(n),
    (L - 1) low bits + gamma(L) prefix."""
    L = F.length(F.bin(n))
    return ((L - 1) + 2 * (F.length(F.bin(L)) - 1) + 1).cast("long")


def elias_audit(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    k: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Exact gamma/delta bit cost per term vs varint on the same
    +1-shifted gap stream, for the top-``k`` largest doc-id sets:
    (rank, term, n_docs, gamma_bits, delta_bits, varint_bits,
    bpp_gamma, bpp_delta, bpp_varint), rank by (n_docs desc, term)."""
    p = postings.select(
        F.col(term_col).alias("term"), F.col(id_col).alias("id")
    ).distinct()
    wt = Window.partitionBy("term").orderBy("id")
    gap = F.col("id") - F.coalesce(F.lag("id").over(wt), F.lit(-1))
    sized = (
        p.withColumn("gap", gap)
        .withColumn("g_bits", gamma_bits(F.col("gap")))
        .withColumn("d_bits", delta_bits(F.col("gap")))
        .withColumn("v_bits", varint_len(F.col("gap")) * 8)
    )
    agg = sized.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("g_bits").alias("gamma_bits"),
        F.sum("d_bits").alias("delta_bits"),
        F.sum("v_bits").alias("varint_bits"),
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("term").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "n_docs",
            "gamma_bits",
            "delta_bits",
            "varint_bits",
            F.round(F.col("gamma_bits") / F.col("n_docs"), round_digits)
            .alias("bpp_gamma"),
            F.round(F.col("delta_bits") / F.col("n_docs"), round_digits)
            .alias("bpp_delta"),
            F.round(F.col("varint_bits") / F.col("n_docs"), round_digits)
            .alias("bpp_varint"),
        )
    )
