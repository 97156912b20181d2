"""Distributed Bloom-filter membership + cross-snapshot dedup
(ops/dedup.py round-3 additions).

Contracts: standard Bloom semantics (Bloom 1970) — zero false
negatives, bounded false positives — built/probed relationally; and
the incremental recrawl dedup shape (persisted hash store anti-join).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops import dedup


@pytest.fixture(scope="module")
def corpora(spark):
    seen = spark.createDataFrame(
        [(i, f"seen doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # 50 repeats of seen content + 150 genuinely new
    new = spark.createDataFrame(
        [(1000 + i, f"seen doc {i}") for i in range(50)]
        + [(2000 + i, f"new doc {i}") for i in range(150)],
        "doc_id long, text string",
    )
    return seen.cache(), new.cache()


def test_bloom_positions_match_md5(spark):
    df = spark.createDataFrame([("abc",)], "k string")
    got = sorted(
        r.p
        for r in df.select(
            F.explode(
                F.array(*dedup._bloom_pos_exprs(F.col("k"), 1 << 16, 3))
            ).alias("p")
        ).collect()
    )
    want = sorted(
        int(hashlib.md5(f"abc:{i}".encode()).hexdigest()[:8], 16) % (1 << 16)
        for i in range(3)
    )
    assert got == want


def test_bloom_no_false_negatives(spark, corpora):
    seen, new = corpora
    stats = dedup.bloom_dedup_stats(
        seen, new, n_bits=1 << 14, n_hashes=4
    ).first()
    assert stats.n_new == 200
    assert stats.n_true_dup == 50
    # every true dup MUST be flagged (no false negatives)
    assert stats.n_maybe_seen >= 50
    assert stats.n_maybe_seen == 50 + stats.n_false_pos
    # 200 keys into 16384 bits: fp rate should be tiny
    assert stats.fp_rate < 0.05


def test_bloom_false_positives_appear_when_undersized(spark, corpora):
    seen, new = corpora
    # 200 keys * 4 hashes into 256 bits: filter saturates, most bits set
    stats = dedup.bloom_dedup_stats(seen, new, n_bits=256, n_hashes=4).first()
    assert stats.n_true_dup == 50  # exact audit unaffected
    assert stats.n_false_pos > 0  # saturation produces false positives
    assert stats.n_maybe_seen == 50 + stats.n_false_pos


def test_bloom_word_table_is_bounded(spark, corpora):
    seen, _ = corpora
    words = dedup.bloom_build(seen.select("text"), "text", n_bits=1 << 10, n_hashes=4)
    assert words.count() <= (1 << 10) // 32


def test_snapshot_dedup(spark, corpora):
    seen, new = corpora
    store = seen.select(F.md5("text").alias("content_hash")).distinct()
    # make an in-snapshot dup: 2000 and 2900 share content
    extra = spark.createDataFrame([(2900, "new doc 0")], "doc_id long, text string")
    out = dedup.snapshot_dedup(new.union(extra), store).collect()
    ids = sorted(r.doc_id for r in out)
    # seen-content docs (1000..1049) dropped; within-snapshot dup keeps 2000
    assert ids == list(range(2000, 2150))
    assert 2900 not in ids
    # survivors' hashes are disjoint from the store
    hashes = {r.content_hash for r in out}
    store_hashes = {r.content_hash for r in store.collect()}
    assert not (hashes & store_hashes)
