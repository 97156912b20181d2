"""Golomb-Rice coding of posting-list doc-id gaps — exact bit-cost
audit vs the live delta+varint codec.

Witten, Moffat & Bell, "Managing Gigabytes" (2nd ed., §3.3): under the
local Bernoulli model a term appearing in df of N documents has
geometric gaps with mean N/df, and the optimal Golomb parameter is
M ~= 0.69 * N/df. Rice coding (Rice & Plaunt 1971) restricts M to a
power of two, M = 2^b, so the codeword for a zero-based gap r is the
unary quotient r >> b, a stop bit, and b remainder bits — the classic
word-aligned-friendly posting codec (used by early Lucene and the MG
system itself) and the fifth sibling of the EF (``index/ef.py``),
NewPFD (``pfor.py``), Roaring (``roaring.py``) and BIC (``bic.py``)
codec audits.

Parameter selection here, stated exactly so the audit is reproducible
on both engines: per term, mean_gap = N/df with N = (max doc id over
the corpus) + 1 (ids are dense from 0), and

    b = bit_length(floor(0.69 * mean_gap)) - 1, floored at 0

i.e. the largest b with 2^b <= 0.69 * mean_gap (b = 0 when the product
is < 1). ``bit_length`` is computed as ``length(bin(x))`` — exact
integer arithmetic, no float log2, identical in Spark and DuckDB.

Gap convention matches the live varint stream (``bic.py``): the first
gap is the doc id itself (previous id 0-coalesced), so gaps are
zero-based and the Rice length of gap g is (g >> b) + 1 + b.

Scale shape: one row_number window per term partition (the same
(term)-keyed shuffle every codec audit shares), then pure projection
arithmetic and one hash aggregate — no UDFs, no driver loops; the only
driver scalar is nothing at all (the universe bound rides along as a
window-free scalar aggregate joined in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len


def rice_param(mean_gap: F.Column) -> F.Column:
    """Largest b with 2^b <= 0.69 * mean_gap, floored at 0 — exact via
    binary-string length of the floored product."""
    x = F.floor(F.lit(0.69) * mean_gap).cast("long")
    return F.when(x < 1, F.lit(0)).otherwise(
        F.length(F.bin(x)) - 1
    ).cast("long")


def rice_audit(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    k: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Exact Golomb-Rice bit cost per term vs the live delta+varint
    stream, for the top-``k`` largest doc-id sets: (rank, term, n_docs,
    rice_b, rice_bits, varint_bits, bpp_rice, bpp_varint, ratio), rank
    by (n_docs desc, term asc)."""
    p = postings.select(
        F.col(term_col).alias("term"), F.col(id_col).alias("id")
    ).distinct()
    n_universe = p.agg((F.max("id") + 1).alias("n")).select("n")
    wt = Window.partitionBy("term").orderBy("id")
    gap = F.col("id") - F.coalesce(F.lag("id").over(wt), F.lit(0))
    g = p.withColumn("gap", gap)
    per_term = g.groupBy("term").agg(F.count(F.lit(1)).alias("n_docs"))
    # b depends only on (term df, universe): join the scalar in, derive
    # b per term, then re-join onto the gap rows for the length sum.
    params = per_term.crossJoin(F.broadcast(n_universe)).select(
        "term",
        "n_docs",
        rice_param(F.col("n") / F.col("n_docs")).alias("rice_b"),
    )
    # integer quotient gap >> b without pow-float drift: use shiftright
    # with a column shift via expr (shiftright accepts column shifts in
    # SQL form).
    sized = g.join(params, "term").withColumn(
        "rice_bits_row",
        F.expr("shiftright(gap, cast(rice_b as int)) + 1 + rice_b").cast(
            "long"
        ),
    ).withColumn("varint_bits_row", varint_len(F.col("gap")) * 8)
    agg = sized.groupBy("term", "n_docs", "rice_b").agg(
        F.sum("rice_bits_row").alias("rice_bits"),
        F.sum("varint_bits_row").alias("varint_bits"),
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("term").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "n_docs",
            "rice_b",
            "rice_bits",
            "varint_bits",
            F.round(F.col("rice_bits") / F.col("n_docs"), round_digits).alias(
                "bpp_rice"
            ),
            F.round(
                F.col("varint_bits") / F.col("n_docs"), round_digits
            ).alias("bpp_varint"),
            F.round(
                F.col("rice_bits") / F.col("varint_bits"), round_digits
            ).alias("ratio"),
        )
    )
