"""Two-pass Misra-Gries heavy hitters (ops/heavyhitters.py): exactness
vs brute force, the superset guarantee under adversarial skew, and
partitioning invariance."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops.heavyhitters import heavy_hitters


def _brute(spark, docs, threshold):
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("term")
    )
    n = toks.count()
    return {
        (r.term, r.cnt)
        for r in toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold * n)
        .collect()
    }


def test_exact_vs_brute_force(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.term, r.cnt)
        for r in heavy_hitters(docs, threshold=0.01, capacity=128).collect()
    }
    assert got == _brute(spark, docs, 0.01)
    assert len(got) > 0


def test_adversarial_skew_small_capacity(spark):
    # one term at 20%, a long tail of singletons; capacity far below
    # the vocabulary forces constant MG decrements
    rows = [(i, "hot") for i in range(200)] + [
        (1000 + i, f"tail{i}") for i in range(800)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    got = {r.term: r.cnt for r in heavy_hitters(docs, 0.1, capacity=16).collect()}
    assert got == {"hot": 200}


def test_partitioning_invariance(spark):
    rows = [(i, f"w{i % 37} w{i % 11} common") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r.term, r.cnt)
        for r in heavy_hitters(docs.repartition(2), 0.02, 64).collect()
    )
    b = sorted(
        (r.term, r.cnt)
        for r in heavy_hitters(docs.repartition(13), 0.02, 64).collect()
    )
    assert a == b and len(a) > 0


def test_threshold_validation(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        heavy_hitters(docs, threshold=0.0)
