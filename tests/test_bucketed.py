"""Bucketed catalog tables (sources/bucketed.py): the equi-join of two
tables bucketed+sorted on the same key must plan WITHOUT any Exchange
(shuffle) — the plan is the contract."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.sources.bucketed import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("dl")
    )
    scores = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 100).alias("quality")
    )
    write_bucketed(docs, "t_doc_stats", 8, "doc_id")
    write_bucketed(scores, "t_quality", 8, "doc_id")
    yield "t_doc_stats", "t_quality"
    spark.sql("DROP TABLE IF EXISTS t_doc_stats")
    spark.sql("DROP TABLE IF EXISTS t_quality")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast: the at-scale case is two big relations, where
    # the bucketed SortMergeJoin must consume buckets with NO shuffle
    a, b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, a, b, "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert not plan_has_exchange(j), plan
        assert "SortMergeJoin" in plan
        assert j.count() == 2000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_shuffle_for_contrast(spark, bucketed_tables):
    a, _ = bucketed_tables
    plain = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("x")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(a).join(plain, "doc_id")
        assert plan_has_exchange(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    a, _ = bucketed_tables
    agg = spark.table(a).groupBy("doc_id").agg(F.sum("dl").alias("s"))
    assert not plan_has_exchange(agg)
