"""Session-L batch 31: markdown scan, license scan, shard balance."""

import pytest
from pyspark.sql import functions as F


def test_markdown_scan_constructs(spark):
    from tokenkit_spark.ops.contamination import markdown_scan

    docs = spark.createDataFrame(
        [
            ("web", "intro\n```python\nprint(1)\n```\ndone"),
            ("web", "# Title\nbody text"),
            ("web", "| a | b |\n|---|---|\n| 1 | 2 |"),
            ("web", "see [docs](https://x.example) for more"),
            ("web", "perfectly plain prose"),
            ("books", "also plain"),
        ],
        "source string, text string",
    )
    out = {r.grp: r for r in markdown_scan(docs).collect()}
    w = out["web"]
    assert w.n_fence == 1 and w.n_heading == 1
    assert w.n_table == 1 and w.n_link == 1
    assert w.docs_any == 4 and w.n_docs == 5
    assert out["books"].docs_any == 0


def test_license_scan_classes(spark):
    from tokenkit_spark.ops.contamination import license_scan

    docs = spark.createDataFrame(
        [
            ("web", "Copyright 2024. All Rights Reserved."),
            ("web", "shared under Creative Commons attribution"),
            ("web", "this work is in the public domain"),
            ("web", "Licensed under the Apache License 2.0"),
            ("web", "no notice at all"),
        ],
        "source string, text string",
    )
    r = license_scan(docs).collect()[0]
    assert r.n_restrictive == 1 and r.n_cc == 1
    assert r.n_public_domain == 1 and r.n_permissive == 1
    assert r.docs_marked == 4 and r.n_docs == 5


def test_shard_balance_uniformish(spark):
    from tokenkit_spark.index.routing import shard_balance_audit

    docs = spark.createDataFrame(
        [(i, 100 + i % 50) for i in range(2000)],
        "doc_id long, n_chars long",
    )
    r = shard_balance_audit(docs, n_shards=16).collect()[0]
    assert r.n_shards_used == 16
    assert r.n_docs == 2000
    mean_docs = r.n_docs / r.n_shards_used
    assert mean_docs == pytest.approx(125.0)
    # md5 routing should be roughly balanced: hot shard < 1.5x mean
    assert 1.0 <= r.max_docs / mean_docs < 1.5
    var = r.sum_docs_sq / r.n_shards_used - mean_docs**2
    assert (max(var, 0.0) ** 0.5) / mean_docs < 0.25
    assert r.max_bytes / (r.total_bytes / r.n_shards_used) >= 1.0
