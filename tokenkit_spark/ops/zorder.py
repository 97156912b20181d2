"""Z-order (Morton-curve) data-layout audit — multi-dimensional
file-skipping vs a linear sort order.

Morton, "A computer oriented geodetic data base" (IBM 1966), applied
as the table-layout strategy behind Delta Lake's ``OPTIMIZE ZORDER BY``
and the clustering literature (e.g. the query-driven layout analyses
in PAPERS.md): parquet/Iceberg scans skip a file when the predicate
falls outside the file's per-column min/max zone map, so the SORT
ORDER at write time decides how many files a selective query touches.
A linear order by (d1, d2) gives perfect pruning on d1 and near-zero
pruning on d2; interleaving the bits of both dimensions (the Z-value)
keeps each file's zone compact in BOTH, trading a little d1 locality
for d2 pruning that linear order cannot give.

This audit makes the trade exact on real data: two 4-bit dimensions,
files of ``rows_per_file`` rows cut in each candidate order, zone maps
computed per file, and every point predicate ``d = v`` (v = 0..15)
evaluated against the zone maps.  Output, one row per layout:

    (layout, n_files, avg_files_d1, avg_files_d2, avg_files_mean)

where avg_files_dX = mean over v of files whose [min,max] zone
intersects v.  The Z-value is closed-form integer arithmetic
(bit i via div/mod — identical in Spark and DuckDB), and global file
numbers come from the range-partition rank (``reorder.assign_ids``),
not a single-partition window — the audit itself scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton2(d1, d2, bits: int = 4):
    """Interleave two ``bits``-wide non-negative ints: d1 bits land on
    odd positions, d2 on even — pure div/mod arithmetic."""
    z = F.lit(0)
    for i in range(bits):
        b1 = (d1 / (1 << i)).cast("long") % 2
        b2 = (d2 / (1 << i)).cast("long") % 2
        z = z + b1 * (1 << (2 * i + 1)) + b2 * (1 << (2 * i))
    return z.cast("long")


def zorder_audit(
    rows: DataFrame,
    d1_col: str,
    d2_col: str,
    rows_per_file: int = 64,
    bits: int = 4,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """File-skipping audit of linear-(d1,d2) vs Z-order layout; both
    dimensions must already be in [0, 2^bits)."""
    from tokenkit_spark.index.reorder import assign_ids

    keyed = rows.select(
        id_col,
        F.col(d1_col).cast("long").alias("d1"),
        F.col(d2_col).cast("long").alias("d2"),
    ).withColumn("z", morton2(F.col("d1"), F.col("d2"), bits))
    n_vals = 1 << bits
    out = None
    for layout, order_cols in (("linear", ["d1", "d2"]), ("zorder", ["z"])):
        ids = assign_ids(keyed, order_cols, id_col=id_col)
        filed = keyed.join(ids, id_col).select(
            "d1", "d2",
            (F.col("new_id") / rows_per_file).cast("long").alias("f"),
        )
        zones = filed.groupBy("f").agg(
            F.min("d1").alias("min1"), F.max("d1").alias("max1"),
            F.min("d2").alias("min2"), F.max("d2").alias("max2"),
        )
        vals = rows.sparkSession.range(n_vals).select(
            F.col("id").alias("v")
        )
        hits = zones.crossJoin(F.broadcast(vals)).agg(
            F.lit(layout).alias("layout"),
            (F.countDistinct("f")).alias("n_files"),
            F.round(
                F.sum(
                    ((F.col("min1") <= F.col("v"))
                     & (F.col("v") <= F.col("max1"))).cast("int")
                ) / F.lit(float(n_vals)),
                round_digits,
            ).alias("avg_files_d1"),
            F.round(
                F.sum(
                    ((F.col("min2") <= F.col("v"))
                     & (F.col("v") <= F.col("max2"))).cast("int")
                ) / F.lit(float(n_vals)),
                round_digits,
            ).alias("avg_files_d2"),
        )
        out = hits if out is None else out.unionByName(hits)
    return out.withColumn(
        # arithmetic mean of the two per-dimension expected-files-touched
        # numbers — a single-figure layout score, NOT the count of files
        # matching an any-dimension (OR) predicate (ADVICE r03: the old
        # name avg_files_any implied the latter)
        "avg_files_mean",
        F.round(
            (F.col("avg_files_d1") + F.col("avg_files_d2")) / 2.0,
            round_digits,
        ),
    )


def hilbert2(d1, d2, bits: int = 4):
    """Hilbert-curve distance of a (d1, d2) cell on the 2^bits grid —
    the classic xy2d walk (Hilbert 1891; algorithm as in Warren,
    Hacker's Delight §16 / the standard C formulation) unrolled over
    the ``bits`` levels as pure div/mod/CASE arithmetic, so Spark and
    a SQL oracle compute bit-identical values.  Each level reads one
    bit of x and y, adds s^2 * gray(rx, ry) to the distance, and
    rotates/reflects the frame for the next level."""
    n = 1 << bits
    x, y = d1.cast("long"), d2.cast("long")
    d = F.lit(0).cast("long")
    for s in (1 << i for i in range(bits - 1, -1, -1)):
        rx = (x / s).cast("long") % 2
        ry = (y / s).cast("long") % 2
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when((rx == 0) & (ry == 1), 1)
            .when((rx == 1) & (ry == 0), 3)
            .otherwise(2)
        )
        d = d + F.lit(s * s).cast("long") * quad
        # rotate: if ry == 0 swap x/y, reflecting both when rx == 1
        nx = F.when(ry == 1, x).otherwise(
            F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        )
        ny = F.when(ry == 1, y).otherwise(
            F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        )
        x, y = nx, ny
    return d.cast("long")


def hilbert_audit(
    rows: DataFrame,
    d1_col: str,
    d2_col: str,
    rows_per_file: int = 64,
    bits: int = 4,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Three-way file-skipping audit: linear-(d1,d2) vs Z-order vs
    Hilbert order.

    Same zone-map methodology as ``zorder_audit``, plus the Hilbert
    curve — the space-filling order with strictly better locality
    than Morton (every curve step is an adjacent cell, so file zones
    are more compact in both dimensions; Moon et al., "Analysis of
    the clustering properties of the Hilbert space-filling curve",
    TKDE 2001 — the reason HFile/Delta clustering offer it next to
    Z-order).  Output one row per layout: (layout, n_files,
    avg_files_d1, avg_files_d2, avg_files_mean)."""
    from tokenkit_spark.index.reorder import assign_ids

    keyed = (
        rows.select(
            id_col,
            F.col(d1_col).cast("long").alias("d1"),
            F.col(d2_col).cast("long").alias("d2"),
        )
        .withColumn("z", morton2(F.col("d1"), F.col("d2"), bits))
        .withColumn("hb", hilbert2(F.col("d1"), F.col("d2"), bits))
    )
    n_vals = 1 << bits
    out = None
    for layout, order_cols in (
        ("linear", ["d1", "d2"]),
        ("zorder", ["z"]),
        ("hilbert", ["hb"]),
    ):
        ids = assign_ids(keyed, order_cols, id_col=id_col)
        filed = keyed.join(ids, id_col).select(
            "d1", "d2",
            (F.col("new_id") / rows_per_file).cast("long").alias("f"),
        )
        zones = filed.groupBy("f").agg(
            F.min("d1").alias("min1"), F.max("d1").alias("max1"),
            F.min("d2").alias("min2"), F.max("d2").alias("max2"),
        )
        vals = rows.sparkSession.range(n_vals).select(
            F.col("id").alias("v")
        )
        hits = zones.crossJoin(F.broadcast(vals)).agg(
            F.lit(layout).alias("layout"),
            (F.countDistinct("f")).alias("n_files"),
            F.round(
                F.sum(
                    ((F.col("min1") <= F.col("v"))
                     & (F.col("v") <= F.col("max1"))).cast("int")
                ) / F.lit(float(n_vals)),
                round_digits,
            ).alias("avg_files_d1"),
            F.round(
                F.sum(
                    ((F.col("min2") <= F.col("v"))
                     & (F.col("v") <= F.col("max2"))).cast("int")
                ) / F.lit(float(n_vals)),
                round_digits,
            ).alias("avg_files_d2"),
        )
        out = hits if out is None else out.unionByName(hits)
    return out.withColumn(
        # arithmetic mean of the two per-dimension expected-files-touched
        # numbers — a single-figure layout score, NOT the count of files
        # matching an any-dimension (OR) predicate (ADVICE r03: the old
        # name avg_files_any implied the latter)
        "avg_files_mean",
        F.round(
            (F.col("avg_files_d1") + F.col("avg_files_d2")) / 2.0,
            round_digits,
        ),
    )
