"""Document-identifier assignment for posting-list compression.

Silvestri, "Sorting Out the Document Identifier Assignment Problem"
(ECIR 2007): delta-encoded posting lists compress by the SIZE OF THE
GAPS, and gaps shrink when documents that share terms get NEARBY ids.
For web corpora the standard trick is to assign docIDs in URL (or
site/language/source) sort order — near-free at index build time and
routinely worth 10-40% of the docID stream vs crawl-arrival order.

``docid_assignment_gain`` measures that, on this corpus, for the live
codec's varint gap encoding: it assigns ids two ways (natural id order
vs clustering-key order), delta-encodes every term's posting list under
both, and reports total varint bytes per ordering — an empirical A/B
of the assignment policy, not an estimate.

Scale shapes:

* id assignment is a TOTAL-ORDER rank. The scalable form used here is
  range-repartition on the ordering key + within-partition sort +
  within-partition row_number + a per-partition-count offset join (the
  offsets relation is n_partitions rows — broadcast). The assignment
  depends only on the total order (ordering key made total with the
  id tiebreak), never on partition boundaries.
* the gap pass is one (term)-keyed window over the posting relation —
  the same shuffle the segment writer pays; head-term skew lands in a
  window that parallelizes per term.

Varint length is computed with exact integer thresholds (1 byte per
7 bits), matching index/codec.py's wire format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def varint_len(col) -> F.Column:
    """Bytes the LEB128 varint of ``col`` (>= 0) occupies — exact
    integer thresholds, no float log."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c < (1 << 7), 1)
        .when(c < (1 << 14), 2)
        .when(c < (1 << 21), 3)
        .when(c < (1 << 28), 4)
        .otherwise(5)
        .cast("long")
    )


def assign_ids(docs: DataFrame, order_cols: list[str],
               id_col: str = "doc_id") -> DataFrame:
    """(id_col, new_id): dense 0-based ids in (order_cols, id_col)
    total order, assigned with the range-partition + offset-join shape
    (no single-partition global window)."""
    keyed = docs.select(id_col, *[c for c in order_cols if c != id_col])
    parted = keyed.repartitionByRange(*order_cols, id_col).sortWithinPartitions(
        *order_cols, id_col
    ).withColumn("__part", F.spark_partition_id())
    w = Window.partitionBy("__part").orderBy(*order_cols, id_col)
    local = parted.withColumn("__local", F.row_number().over(w) - 1)
    counts = local.groupBy("__part").agg(F.count("*").alias("__n"))
    offsets = counts.withColumn(
        "__off",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__part").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__part", "__off")
    return (
        local.join(F.broadcast(offsets), "__part")
        .select(id_col, (F.col("__local") + F.col("__off")).alias("new_id"))
    )


def docid_assignment_gain(
    docs: DataFrame,
    cluster_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(ordering, n_postings, total_bytes, bytes_per_posting) for
    'natural' (id order) vs 'clustered' (cluster_cols order) docID
    assignment, varint-delta-encoding every term's posting list (first
    posting stores its absolute id; the rest store gaps)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    )

    def total_bytes(ids: DataFrame, label: str) -> DataFrame:
        p = toks.join(ids, "doc_id").select("term", "new_id")
        w = Window.partitionBy("term").orderBy("new_id")
        gap = F.col("new_id") - F.coalesce(
            F.lag("new_id").over(w), F.lit(0)
        )
        return (
            p.withColumn("__b", varint_len(gap))
            .agg(
                F.count("*").alias("n_postings"),
                F.sum("__b").alias("total_bytes"),
            )
            .select(
                F.lit(label).alias("ordering"),
                "n_postings",
                "total_bytes",
                F.round(F.col("total_bytes") / F.col("n_postings"), 4).alias(
                    "bytes_per_posting"
                ),
            )
        )

    natural = assign_ids(docs, [id_col], id_col)
    clustered = assign_ids(docs, list(cluster_cols), id_col)
    return total_bytes(natural, "natural").unionByName(
        total_bytes(clustered, "clustered")
    )
