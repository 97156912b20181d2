"""KMV set operations (ops/kmv.py), packed-window mix audit
(ops/packing.py), thin-content audit (ops/webclean.py)."""

from pyspark.sql import functions as F

from tokenkit_spark.ops.kmv import kmv_set_ops
from tokenkit_spark.ops.packing import pack_documents, packing_mix_audit
from tokenkit_spark.ops.webclean import thin_content


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


def test_kmv_setops_exact_below_k(spark):
    # A = {1..6}, B = {4..9}: below k=64 everything is exact
    rows = [("a", u) for u in range(1, 7)] + [("b", u) for u in range(4, 10)]
    r = kmv_set_ops(_ev(spark, rows), "a", "b", k=64).collect()[0]
    assert r.exact_a == 6 and r.exact_b == 6
    assert r.exact_union == 9 and r.exact_intersection == 3
    # theta is NULL everywhere -> estimates fall back to exact
    assert r.est_a == 6.0 and r.est_union == 9.0
    # intersection estimate with theta=1: count below 1 / 1 = exact
    assert r.est_intersection == 3.0
    assert abs(r.est_jaccard - 3 / 9) < 1e-6


def test_kmv_setops_sketched_above_k(spark):
    # 500 vs 500 users with 250 overlap, k=64 -> sketched estimates
    rows = [("a", u) for u in range(500)] + [
        ("b", u) for u in range(250, 750)
    ]
    r = kmv_set_ops(_ev(spark, rows), "a", "b", k=64).collect()[0]
    assert r.exact_union == 750 and r.exact_intersection == 250
    # KMV error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma
    assert abs(r.est_union - 750) / 750 < 0.4
    assert abs(r.est_intersection - 250) / 250 < 0.6
    assert 0.0 < r.est_jaccard < 1.0


# ----------------------------------------------------------- packing mix


def test_packing_mix_detects_mixed_bins(spark):
    docs = spark.createDataFrame(
        [
            (0, "web", 100), (32, "news", 100),   # shard 0, same bin
            (1, "web", 100), (33, "web", 100),    # shard 1, same source
        ],
        "doc_id long, source string, n_tokens long",
    )
    packed = pack_documents(docs, capacity=256, n_shards=32)
    r = packing_mix_audit(packed, docs.select("doc_id", "source")).collect()[
        0
    ]
    assert r.n_bins == 2
    assert r.n_mixed_bins == 1
    assert abs(r.frac_mixed - 0.5) < 1e-9
    assert r.avg_docs_per_bin == 2.0


# --------------------------------------------------------- thin content


def test_thin_content_shares_and_median(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", 100), (2, "a", 300), (3, "a", 500),
            (4, "b", 50),
        ],
        "doc_id long, source string, n_chars long",
    )
    out = {r.source: r for r in thin_content(docs, 200).collect()}
    a = out["a"]
    assert a.n_pages == 3 and a.n_thin == 1
    assert abs(a.frac_thin - 1 / 3) < 1e-6
    assert a.median_chars == 300.0
    b = out["b"]
    assert b.frac_thin == 1.0 and b.mean_chars == 50.0
