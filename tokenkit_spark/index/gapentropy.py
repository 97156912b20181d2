"""Order-0 entropy audit of posting-list doc-id gaps vs the live
varint codec, bucketed by term document frequency.

The information-theoretic floor for any order-0 gap coder is the
Shannon entropy of the gap distribution (Witten/Moffat/Bell, "Managing
Gigabytes", ch. 3; the standard yardstick the NewPFD (index/pfor.py),
Elias-Fano (index/ef.py), BIC (index/bic.py) and Roaring
(index/roaring.py) audits are measured against).  This audit computes,
per df bucket b = floor(log2(df)):

    H_b = log2(N_b) - (1/N_b) * sum_g n_g * log2(n_g)

over the bucket's empirical gap histogram {gap g: count n_g}, and
compares it with the live delta+varint stream's bits/gap (8 *
varint_len; gap convention identical to index/bic.py — first gap =
doc_id - 0).  ``headroom = varint_bits / H_b`` says how far the byte-
aligned codec sits above the entropy floor: rare terms (large sparse
gaps) sit near 1.2-1.5x, head terms (gap≈1 runs) can show 8x+ —
exactly the regime where PFD/EF/BIC buy their wins, so the bucket
curve is the codec-selection evidence.

Scale shape: one lag window partitioned by term (the same shuffle the
index build already pays), one (bucket, gap) count aggregate with
map-side partials, one bucket rollup — no UDFs, no driver state, no
collect; histogram cardinality is bounded by distinct gap values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len


def gap_entropy_audit(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """(term, doc_id) postings -> one row per df bucket:
    (df_bucket, n_terms, n_gaps, h_bits, varint_bits, headroom),
    ordered by df_bucket.  h_bits is the order-0 entropy floor in
    bits/gap; varint_bits the live codec's bits/gap."""
    p = postings.select(term_col, F.col(id_col).alias("id")).distinct()
    df_per_term = p.groupBy(term_col).agg(F.count(F.lit(1)).alias("df"))
    wt = Window.partitionBy(term_col).orderBy("id")
    gaps = (
        p.withColumn(
            "gap", F.col("id") - F.coalesce(F.lag("id").over(wt), F.lit(0))
        )
        .join(
            df_per_term.withColumn(
                "df_bucket", F.floor(F.log2(F.col("df"))).cast("long")
            ),
            term_col,
        )
        .select("df_bucket", term_col, "gap")
    )
    hist = gaps.groupBy("df_bucket", "gap").agg(
        F.count(F.lit(1)).alias("n_g"),
        (F.sum(varint_len(F.col("gap")) * 8)).alias("vbits_g"),
    )
    buckets = hist.groupBy("df_bucket").agg(
        F.sum("n_g").alias("n_gaps"),
        F.sum(F.col("n_g") * F.log2("n_g")).alias("sum_nlogn"),
        F.sum("vbits_g").alias("vbits"),
    )
    n_terms = (
        df_per_term.withColumn(
            "df_bucket", F.floor(F.log2(F.col("df"))).cast("long")
        )
        .groupBy("df_bucket")
        .agg(F.count(F.lit(1)).alias("n_terms"))
    )
    h = F.log2(F.col("n_gaps")) - F.col("sum_nlogn") / F.col("n_gaps")
    vb = F.col("vbits") / F.col("n_gaps")
    return (
        buckets.join(n_terms, "df_bucket")
        .select(
            "df_bucket",
            "n_terms",
            "n_gaps",
            F.round(h, round_digits).alias("h_bits"),
            F.round(vb, round_digits).alias("varint_bits"),
            F.round(
                vb / F.greatest(h, F.lit(1e-12)), round_digits
            ).alias("headroom"),
        )
        .orderBy("df_bucket")
    )
