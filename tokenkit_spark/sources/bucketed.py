"""Spark-native bucketed tables: co-located joins without a shuffle.

The index engine's own layout (term_bucket partition dirs + doc-shard
salting, index/build.py) covers the query path; THIS module is the
general-relation counterpart for pipeline tables that get joined on the
same key over and over (doc_stats ⋈ postings ⋈ quality scores ⋈
dedup verdicts, all on doc_id at every pipeline stage):

* ``write_bucketed`` persists a DataFrame with ``bucketBy(n, key)`` +
  ``sortBy(key)`` — Spark records the bucket spec in the catalog, and
  every later equi-join or aggregation on that key reads co-located,
  pre-sorted buckets: NO Exchange, NO Sort in the plan (SortMergeJoin
  consumes the buckets directly). At 100 TB that turns the pipeline's
  recurring doc_id joins from full-corpus shuffles into map-side zips.
* ``plan_has_exchange`` inspects the physical plan — the test/bench
  hook proving the shuffle actually disappeared (the plan IS the
  contract; a silently degraded bucket spec would reintroduce a
  corpus-wide shuffle without changing results).

Bucket counts should be sized once per corpus (buckets ≈ corpus /
target-task-size) and kept STABLE across tables that join — equal
bucket counts (or integer multiples, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) are what allow
the exchange-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Overwrites an existing table of the same name."""
    w = df.write.format(fmt).mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE Exchange (hash /
    range / single-partition repartitioning of the data). A
    BroadcastExchange does not count — it ships a small relation, not
    the table. The assertion hook for 'this join is bucket-co-located'.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return bool(re.search(r"(?<!Broadcast)Exchange\b", plan))


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket key. With matching
    bucket specs this plans as a zero-shuffle SortMergeJoin."""
    return spark.table(left_table).join(spark.table(right_table), key)
