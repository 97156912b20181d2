"""DSIR importance resampling (ops/dsir.py).

Reference contract: Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" (arXiv:2302.03169) — hashed-n-gram
bag features, smoothed target/raw log-likelihood-ratio weights,
resample-by-weight (deterministic top-k variant here).
"""

import math

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops import dsir


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # target docs (quality): about cooking
        (0, "bake the bread", True),
        (1, "bake fresh bread daily", True),
        # raw pool: one cooking-like doc, one off-topic, one mixed
        (10, "bake bread now", False),
        (11, "crypto coin pump dump", False),
        (12, "bread and crypto", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_target boolean")


def test_hashed_features_count_occurrences_and_bigrams(spark):
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    feats = dsir.hashed_ngram_features(docs, n_buckets=1 << 20).collect()
    # 3 unigrams (a, b, a — occurrences, not distinct) + 2 bigrams
    assert len(feats) == 5
    uni_only = dsir.hashed_ngram_features(docs, n_buckets=1 << 20, bigrams=False)
    assert uni_only.count() == 3
    # deterministic: same gram -> same bucket (the two 'a's collide)
    buckets = [r.bucket for r in feats]
    assert len(set(buckets)) == 4


def test_log_ratio_matches_closed_form(spark, corpus):
    B, alpha = 1 << 20, 1.0  # huge B: no hash collisions in this vocab
    feats = dsir.hashed_ngram_features(corpus, n_buckets=B).join(
        corpus.select("doc_id", "is_target"), "doc_id"
    )
    tgt = feats.filter("is_target").select("doc_id", "bucket")
    raw = feats.filter("NOT is_target").select("doc_id", "bucket")
    ratio = {r.bucket: r.log_ratio for r in dsir.dsir_log_ratio(raw, tgt, B, alpha).collect()}

    n_t, n_r = tgt.count(), raw.count()
    # bucket of the unigram "bake": target count 2, raw count 1
    bake = dsir.hashed_ngram_features(
        spark.createDataFrame([(0, "bake")], "doc_id long, text string"),
        n_buckets=B, bigrams=False,
    ).collect()[0].bucket
    want = math.log((2 + alpha) / (n_t + alpha * B)) - math.log(
        (1 + alpha) / (n_r + alpha * B)
    )
    assert abs(ratio[bake] - want) < 1e-12
    # "crypto": target 0 (smoothed floor), raw 2
    crypto = dsir.hashed_ngram_features(
        spark.createDataFrame([(0, "crypto")], "doc_id long, text string"),
        n_buckets=B, bigrams=False,
    ).collect()[0].bucket
    want = math.log(alpha / (n_t + alpha * B)) - math.log(
        (2 + alpha) / (n_r + alpha * B)
    )
    assert abs(ratio[crypto] - want) < 1e-12


def test_dsir_select_prefers_target_like_docs(spark, corpus):
    out = dsir.dsir_select(
        corpus, F.col("is_target"), n_buckets=1 << 20, k=3
    ).collect()
    # only raw-pool docs are scored, ranks contiguous
    assert [r.rank for r in out] == [1, 2, 3]
    assert {r.doc_id for r in out} == {10, 11, 12}
    by_doc = {r.doc_id: r for r in out}
    # the cooking doc must outrank the crypto doc on the per-gram average
    assert by_doc[10].avg_log_ratio > by_doc[12].avg_log_ratio > by_doc[11].avg_log_ratio
    # and on total weight the pure off-topic doc is last
    assert max(out, key=lambda r: r.rank).doc_id == 11
    # log_w == n_grams * avg (rounding aside)
    for r in out:
        assert abs(r.log_w - r.n_grams * r.avg_log_ratio) < 1e-3
