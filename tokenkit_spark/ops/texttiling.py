"""TextTiling topic segmentation, fully relational.

Hearst, "TextTiling: Segmenting Text into Multi-paragraph Subtopic
Passages" (Computational Linguistics 23(1), 1997), block-comparison
variant:

1. The token stream is cut into pseudo-sentences of ``w`` tokens
   ("token-sequences").
2. At each gap g between token-sequences, the lexical score is the
   cosine between the tf vectors of the ``k`` sequences left of g
   and the ``k`` sequences right of g (clipped at document edges).
3. The depth score at g is (peak_l - s_g) + (peak_r - s_g).  Hearst
   scans outward "while scores keep rising"; the relational variant
   here takes the max within a fixed ``lookaround`` of gaps on each
   side (the common bounded-window implementation — stated, and
   mirrored exactly by the oracle), each leg clamped at 0.
4. Gaps whose depth exceeds the document's cutoff mean(depth) -
   stddev(depth)/2 (population stddev; the paper's LC cutoff) are
   subtopic boundaries.

Output: every interior gap with its score, depth, and boundary flag —
the caller cuts documents at ``is_boundary`` gaps (chunking for RAG /
training-window packing is the 100-TB consumer; cf. ops/chunking.py's
fixed-width splitter, which this upgrades to topical splits).

Scale shape: everything is keyed by (doc, gap) or (doc, gap, term) —
block membership is a bounded explode (each sequence joins at most
2*``k`` gaps), the cosine is a hash aggregate, the depth pass is two
bounded windows per doc, and the cutoff is one more per-doc window.
No UDFs, no driver loops, nothing corpus-wide but the token pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def texttiling(
    docs: DataFrame,
    w: int = 20,
    k: int = 2,
    lookaround: int = 3,
    doc_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, gap, sim, depth, is_boundary) — one row per interior
    gap between w-token pseudo-sentences; see module doc."""
    toks = docs.select(
        doc_col,
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("pos", "term"),
    ).withColumn("seq", F.floor(F.col("pos") / w))
    tf = toks.groupBy(doc_col, "seq", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_seq = toks.groupBy(doc_col).agg(
        (F.max("seq") + 1).alias("n_seq")
    )
    # gap g in [1, n_seq-1]; sequence s feeds the LEFT block of gaps
    # [s+1, s+k] and the RIGHT block of gaps [s-k+1, s]
    members = tf.join(n_seq, doc_col).select(
        doc_col,
        "term",
        "tf",
        # NB: F.sequence(a, b) DESCENDS when a > b, so both legs are
        # generated over their un-clipped (always-ascending) ranges and
        # clipped to the valid interior-gap interval [1, n_seq-1] with
        # F.filter afterwards — the first/last sequence of a doc would
        # otherwise emit phantom memberships (incl. a nonexistent gap 0).
        F.explode(
            F.concat(
                F.transform(
                    F.filter(
                        F.sequence(F.col("seq") + 1, F.col("seq") + k),
                        lambda g: g <= F.col("n_seq") - 1,
                    ),
                    lambda g: F.struct(
                        g.alias("gap"), F.lit("l").alias("side")
                    ),
                ),
                F.transform(
                    F.filter(
                        F.sequence(F.col("seq") - k + 1, F.col("seq")),
                        lambda g: (g >= 1) & (g <= F.col("n_seq") - 1),
                    ),
                    lambda g: F.struct(
                        g.alias("gap"), F.lit("r").alias("side")
                    ),
                ),
            )
        ).alias("m"),
    ).select(
        doc_col, F.col("m.gap").alias("gap"), F.col("m.side").alias("side"),
        "term", "tf",
    )
    block_tf = members.groupBy(doc_col, "gap", "side", "term").agg(
        F.sum("tf").alias("btf")
    )
    dots = (
        block_tf.filter(F.col("side") == "l")
        .alias("L")
        .join(
            block_tf.filter(F.col("side") == "r").alias("R"),
            (F.col(f"L.{doc_col}") == F.col(f"R.{doc_col}"))
            & (F.col("L.gap") == F.col("R.gap"))
            & (F.col("L.term") == F.col("R.term")),
        )
        .groupBy(
            F.col(f"L.{doc_col}").alias(doc_col), F.col("L.gap").alias("gap")
        )
        .agg(F.sum(F.col("L.btf") * F.col("R.btf")).alias("dot"))
    )
    norms = block_tf.groupBy(doc_col, "gap", "side").agg(
        F.sqrt(F.sum(F.col("btf") * F.col("btf"))).alias("nrm")
    )
    gaps = (
        norms.groupBy(doc_col, "gap")
        .pivot("side", ["l", "r"])
        .agg(F.first("nrm"))
        .join(dots, [doc_col, "gap"], "left")
        .select(
            doc_col,
            "gap",
            F.coalesce(
                F.col("dot") / (F.col("l") * F.col("r")), F.lit(0.0)
            ).alias("sim"),
        )
    )
    wl = (
        Window.partitionBy(doc_col)
        .orderBy("gap")
        .rowsBetween(-lookaround, -1)
    )
    wr = (
        Window.partitionBy(doc_col)
        .orderBy("gap")
        .rowsBetween(1, lookaround)
    )
    depth = gaps.withColumn(
        "depth",
        F.greatest(
            F.coalesce(F.max("sim").over(wl), F.col("sim")) - F.col("sim"),
            F.lit(0.0),
        )
        + F.greatest(
            F.coalesce(F.max("sim").over(wr), F.col("sim")) - F.col("sim"),
            F.lit(0.0),
        ),
    )
    wd = Window.partitionBy(doc_col)
    return depth.select(
        doc_col,
        "gap",
        F.round("sim", round_digits).alias("sim"),
        F.round("depth", round_digits).alias("depth"),
        (
            F.col("depth")
            > F.avg("depth").over(wd)
            - F.stddev_pop("depth").over(wd) / 2.0
        ).alias("is_boundary"),
    )
