"""geohash_grid, ip_range, sampler, categorize_text, trending_terms."""

import datetime

from pyspark.sql import functions as F

from tokenkit_spark.ops import aggs, geo


def test_geohash_known_value(spark):
    # the canonical geohash example: (57.64911, 10.40744) -> u4pruydqqvj
    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    for p, want in [(1, "u"), (5, "u4pru"), (11, "u4pruydqqvj")]:
        got = df.select(geo.geohash_key(F.col("lat"), F.col("lon"), p).alias("g")).collect()[0].g
        assert got == want, (p, got)
    # domain edges clamp instead of overflowing
    edge = spark.createDataFrame([(90.0, 180.0), (-90.0, -180.0)], "lat double, lon double")
    keys = [r.g for r in edge.select(geo.geohash_key(F.col("lat"), F.col("lon"), 5).alias("g")).collect()]
    assert keys == ["zzzzz", "00000"]


def test_ip_range_half_open_and_overlap(spark):
    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.0.5",), ("10.0.1.0",), ("192.168.0.1",)],
        "ip string",
    )
    out = {
        r.key: r.doc_count
        for r in aggs.ip_range_agg(
            df,
            "ip",
            [
                ("a", None, "10.0.0.5"),       # to is EXCLUSIVE
                ("b", "10.0.0.5", "10.0.2.0"),
                ("wide", "10.0.0.0", None),    # unbounded: overlaps a, b, and 192.*
            ],
        ).collect()
    }
    assert out == {"a": 1, "b": 2, "wide": 4}


def test_ip_to_long(spark):
    df = spark.createDataFrame([("1.2.3.4",), ("255.255.255.255",)], "ip string")
    vals = [r.v for r in df.select(aggs.ip_to_long("ip").alias("v")).collect()]
    assert vals == [16909060, 4294967295]


def test_sampler_top_cut(spark):
    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], "id int, score double"
    ).repartition(7)
    got = aggs.sampler_top(df, "score", 10, "id").collect()
    assert len(got) == 10
    assert all(r.score == 9.0 for r in got)  # the ten score-9 rows win
    assert sorted(r.id for r in got) == [9, 19, 29, 39, 49, 59, 69, 79, 89, 99]


def test_categorize_text_drops_variables(spark):
    df = spark.createDataFrame(
        [
            ("Connection from 10.0.0.1 refused",),
            ("Connection from 10.9.8.7 refused",),
            ("Disk full on /dev/sda1",),
        ],
        "text string",
    )
    out = {r.category: r.doc_count for r in aggs.categorize_text(df, "text", max_tokens=4).collect()}
    # the two log lines differ only in the digit token -> one category
    assert out["connection from refused"] == 2
    assert out["disk full on"] == 1


def test_trending_terms_per_bucket(spark):
    rows = [
        (datetime.datetime(2026, 1, 1, 5), "spark spark flink"),
        (datetime.datetime(2026, 1, 1, 9), "spark beam"),
        (datetime.datetime(2026, 1, 2, 1), "duck duck duck goose"),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    out = aggs.trending_terms(df, "ts", "text", interval="day", k=2).collect()
    d1 = {(r.term, r.rank) for r in out if r.bucket.day == 1}
    d2 = {(r.term, r.rank) for r in out if r.bucket.day == 2}
    assert d1 == {("spark", 1), ("beam", 2)}  # tf 3 beats tie beam/flink by name
    assert d2 == {("duck", 1), ("goose", 2)}
