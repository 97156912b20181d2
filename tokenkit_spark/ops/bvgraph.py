"""Boldi-Vigna webgraph compression — exact bit-cost audit of the
reference+residual successor-list encoding vs raw and delta+varint.

Boldi & Vigna, "The WebGraph Framework I: Compression Techniques"
(WWW 2004): successor lists of web graphs compress to a few bits/link
because (a) consecutive ids share successors (similarity -> encode a
*reference* to a previous list plus a copy bit-vector and residuals)
and (b) residual gaps are power-law distributed (-> zeta_k codes;
Boldi & Vigna, "Codes for the World-Wide Web", Internet Math 2005).
This audit prices the copy-list variant of the format exactly:

per node x with sorted successor list S and predecessor list P (the
previous non-empty list within the node's chunk, reference window 1):

  outdegree   gamma(|S|)            (gamma of n>=1: 2*floor(log2 n)+1)
  no-ref arm  gamma(1)=1 bit  + zeta_3 residual stream over all of S
  ref arm     gamma(2)=3 bits + |P| copy bits
                              + zeta_3 residual stream over S \\ P
  (cheaper arm wins; first residual v1 is coded as
   zeta_3(nat2int(v1 - x) + 1) with nat2int(d) = 2d for d>=0 and
   2|d|-1 for d<0 — the paper's signed mapping — and every later
   residual as zeta_3 of the gap to its predecessor, gaps >= 1.)

zeta_3 codeword length, exact integer form (derived from the paper's
minimal-binary interval split; no float log anywhere): for n >= 1 with
lb = bit_length(n) - 1 = length(bin(n)) - 1 and h = lb div 3,

    len(zeta_3(n)) = 4*h + 3 + (0 if lb mod 3 == 0 else 1)

Chunking models WebGraph's parallel compression: nodes are split into
contiguous id ranges (``chunk_size`` ids); references never cross a
chunk boundary, so each chunk compresses independently — the exact
seam a 1000-executor run would partition on (repartitionByRange on the
node id), making every window below chunk-local.

Scale shape: one (src,dst)-distinct, one chunk-partitioned lag to find
the predecessor, one anti-join for residuals (dst-keyed within src),
two per-src ordered windows for gap coding, and hash aggregates — no
UDFs, no arrays collected to the driver, no cross-chunk dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.index.reorder import varint_len


def gamma_len(n: F.Column) -> F.Column:
    """Bits of the Elias gamma code of n >= 1."""
    return (2 * (F.length(F.bin(n)) - 1) + 1).cast("long")


def zeta3_len(n: F.Column) -> F.Column:
    """Bits of the zeta_3 code of n >= 1 (exact integer form above)."""
    lb = F.length(F.bin(n)) - 1
    h = F.floor(lb / 3).cast("long")
    return (
        4 * h + 3 + F.when(lb % 3 == 0, F.lit(0)).otherwise(F.lit(1))
    ).cast("long")


def _residual_stream_bits(rows: DataFrame, label: str) -> DataFrame:
    """Sum zeta_3 bits of one residual stream: ``rows`` is (src, dst)
    with the node id riding along as ``x``; first residual per src uses
    the signed nat2int mapping vs x, later ones the gap to the previous
    residual. Returns (src, <label>)."""
    ws = Window.partitionBy("src").orderBy("dst")
    prev = F.lag("dst").over(ws)
    d = F.col("dst") - F.col("x")
    first_val = (
        F.when(d >= 0, 2 * d).otherwise(-2 * d - 1) + 1
    )  # nat2int(d) + 1 >= 1
    n = F.when(prev.isNull(), first_val).otherwise(F.col("dst") - prev)
    return (
        rows.withColumn("__bits", zeta3_len(n))
        .groupBy("src")
        .agg(F.sum("__bits").alias(label))
    )


def bv_graph_audit(
    edges: DataFrame, chunk_size: int = 64, round_digits: int = 4
) -> DataFrame:
    """One-row summary of the exact compressed size of the link graph
    under (raw 32-bit, delta+varint, BV copy-list+zeta_3) with the
    reference-arm share: (nodes, links, raw_bits, varint_bits, bv_bits,
    ref_nodes, bpl_raw, bpl_varint, bpl_bv)."""
    succ = edges.select("src", "dst").distinct()
    deg = succ.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    chunked = deg.withColumn(
        "chunk", F.floor(F.col("src") / chunk_size).cast("long")
    )
    wc = Window.partitionBy("chunk").orderBy("src")
    pred = chunked.withColumn("prev_src", F.lag("src").over(wc)).withColumn(
        "prev_deg", F.lag("outdeg").over(wc)
    )

    # no-ref arm: zeta stream over the full successor list
    full = succ.withColumn("x", F.col("src"))
    cost_a = _residual_stream_bits(full, "bits_a")

    # ref arm: residuals = successors NOT in the predecessor's list
    prev_edges = succ.select(
        F.col("src").alias("prev_src"), F.col("dst").alias("pdst")
    )
    with_prev = succ.join(
        pred.select("src", "prev_src").filter(F.col("prev_src").isNotNull()),
        "src",
    )
    residuals = with_prev.join(
        prev_edges,
        (with_prev["prev_src"] == prev_edges["prev_src"])
        & (with_prev["dst"] == prev_edges["pdst"]),
        "left_anti",
    ).select("src", "dst").withColumn("x", F.col("src"))
    cost_b = _residual_stream_bits(residuals, "bits_b")

    per_node = (
        pred.join(cost_a, "src", "left")
        .join(cost_b, "src", "left")
        .select(
            "src",
            "outdeg",
            gamma_len(F.col("outdeg")).alias("deg_bits"),
            (F.lit(1) + F.coalesce(F.col("bits_a"), F.lit(0))).alias(
                "arm_a"
            ),
            F.when(
                F.col("prev_src").isNotNull(),
                F.lit(3)
                + F.col("prev_deg")
                + F.coalesce(F.col("bits_b"), F.lit(0)),
            ).alias("arm_b"),
        )
        .select(
            "src",
            "outdeg",
            (
                F.col("deg_bits")
                + F.when(
                    F.col("arm_b").isNotNull()
                    & (F.col("arm_b") < F.col("arm_a")),
                    F.col("arm_b"),
                ).otherwise(F.col("arm_a"))
            ).alias("bv_bits"),
            F.when(
                F.col("arm_b").isNotNull() & (F.col("arm_b") < F.col("arm_a")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("used_ref"),
        )
    )

    wsrc = Window.partitionBy("src").orderBy("dst")
    vgap = F.col("dst") - F.coalesce(F.lag("dst").over(wsrc), F.lit(0))
    varint_bits = succ.withColumn("__b", varint_len(vgap) * 8).agg(
        F.sum("__b").alias("varint_bits")
    )

    totals = per_node.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.sum("outdeg").alias("links"),
        F.sum("bv_bits").alias("bv_bits"),
        F.sum("used_ref").alias("ref_nodes"),
    )
    return (
        totals.crossJoin(F.broadcast(varint_bits))
        .select(
            "nodes",
            "links",
            (F.col("links") * 32).alias("raw_bits"),
            "varint_bits",
            "bv_bits",
            "ref_nodes",
            F.lit(32.0).alias("bpl_raw"),
            F.round(F.col("varint_bits") / F.col("links"), round_digits)
            .alias("bpl_varint"),
            F.round(F.col("bv_bits") / F.col("links"), round_digits).alias(
                "bpl_bv"
            ),
        )
    )
