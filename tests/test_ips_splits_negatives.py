"""IPS counterfactual evaluation (ops/clicks.py), domain-disjoint
splits (ops/splits.py), BM25 hard negatives (index/negatives.py)."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.index.negatives import hard_negatives
from tokenkit_spark.ops.clicks import ips_policy_value
from tokenkit_spark.ops.splits import domain_disjoint_split


def _log(spark, rows):
    return spark.createDataFrame(
        rows,
        "query_id long, session_id long, position int, doc_id long, "
        "clicked int",
    )


def _rankers(spark, rows):
    return spark.createDataFrame(
        rows, "ranker string, query_id long, doc_id long, rnk int"
    )


def test_ips_logged_policy_recovers_its_own_value(spark):
    # Ranker identical to the logged SERP: e(rank_new) == e(p_logged),
    # so every weight is exactly `clicked` and IPS/serp == logged CTR.
    rows = []
    for s in range(3):
        for p in range(1, 5):
            rows.append((1, s, p, 100 + p, 1 if p <= 2 else 0))
    log = _log(spark, rows)
    rk = _rankers(spark, [("L", 1, 100 + p, p) for p in range(1, 5)])
    out = ips_policy_value(log, rk, k=10).collect()[0]
    assert out.serps == 3
    assert out.ips_clicks_serp == pytest.approx(out.logged_ctr_serp)


def test_ips_promoting_clicked_doc_raises_value(spark):
    # Query 1 pins a decreasing examination curve; query 2's doc 203
    # is clicked EVERY time despite sitting at rank 3 (attractiveness
    # far above its examination), so a ranker promoting it to rank 1
    # must score higher than the logged order under IPS. (If all
    # attractiveness were equal, IPS is permutation-invariant.)
    rows = []
    for s in range(8):
        rows.append((1, s, 1, 101, 1))
        rows.append((1, s, 2, 102, 1 if s < 4 else 0))
        rows.append((1, s, 3, 103, 1 if s < 2 else 0))
    for s in range(2):
        rows.append((2, s, 1, 201, 0))
        rows.append((2, s, 2, 202, 0))
        rows.append((2, s, 3, 203, 1))
    log = _log(spark, rows)
    better = _rankers(
        spark,
        [("B", 2, 203, 1), ("B", 2, 201, 2), ("B", 2, 202, 3)],
    )
    same = _rankers(
        spark,
        [("L", 2, 201, 1), ("L", 2, 202, 2), ("L", 2, 203, 3)],
    )
    out = {
        r.ranker: r.ips_clicks_serp
        for r in ips_policy_value(
            log, better.unionByName(same), k=10
        ).collect()
    }
    assert out["B"] > out["L"]


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, f"text {i}", "en", f"src{i % 7}", 6) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_split_is_group_disjoint_and_complete(spark):
    out = domain_disjoint_split(_docs(spark, 300)).collect()
    assert sum(r.n_docs for r in out) == 300
    assert all(r.leaked_groups == 0 for r in out)
    assert {r.split for r in out} <= {"train", "val", "test"}
    train = [r for r in out if r.split == "train"][0]
    assert train.doc_share > 0.5  # 80% target, group-quantized


def test_split_is_stable_under_corpus_growth(spark):
    # A group's split never changes when more groups appear.
    from tokenkit_spark.ops.splits import group_split_col

    d_small = _docs(spark, 100).select(
        F.col("source").alias("g"),
        group_split_col(F.col("source")).alias("split"),
    ).distinct()
    d_big = _docs(spark, 1000).select(
        F.col("source").alias("g"),
        group_split_col(F.col("source")).alias("split"),
    ).distinct()
    small = dict(d_small.collect())
    big = dict(d_big.collect())
    for g, sp in small.items():
        assert big[g] == sp


def test_hard_negatives_exclude_full_matches(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),   # full match -> positive, excluded
            (2, "alpha alpha alpha"),  # partial, high tf -> hard negative
            (3, "beta beta"),          # partial
            (4, "unrelated words"),    # no match -> absent
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "alpha beta")], "query_id long, text string"
    )
    out = hard_negatives(docs, qs, k=10).collect()
    ids = [r.doc_id for r in out]
    assert 1 not in ids and 4 not in ids
    assert set(ids) == {2, 3}
    assert [r.rank for r in out] == [1, 2]


def test_hard_negatives_empty_for_unmatched_query(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(0, "zzz")], "query_id long, text string")
    assert hard_negatives(docs, qs).count() == 0
