"""Session-L batch 24: autocomplete selectivity, ER blocking, growth
accounting."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


def test_autocomplete_selectivity_decays(spark):
    from tokenkit_spark.index.wordbreak import autocomplete_selectivity

    docs = spark.createDataFrame(
        [(0, "apple apply apricot banana band bandit cherry")],
        "doc_id long, text string",
    )
    out = {r.prefix_len: r for r in autocomplete_selectivity(
        docs
    ).collect()}
    # 'a' prefix holds 3 terms, 'b' 3, 'c' 1 -> mean 7/3
    assert out[1].n_prefixes == 3
    assert out[1].mean_candidates == pytest.approx(7 / 3, abs=1e-4)
    # longer prefixes resolve more uniquely
    assert out[4].frac_resolved >= out[1].frac_resolved
    assert out[1].max_candidates == 3


def test_er_blocking_metrics(spark):
    from tokenkit_spark.ops.dedup import er_blocking_audit

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 13 + j) % 97}" for j in range(30)))
         for i in range(20)],
        "doc_id long, text string",
    )
    r = er_blocking_audit(docs).collect()[0]
    assert r.n_records == 24  # 20 + 4 perturbed copies
    assert r.total_pairs == 24 * 23 // 2
    # planted pairs always share grams -> full completeness
    assert r.pairs_completeness == 1.0
    assert 0 <= r.reduction_ratio <= 1


def test_growth_accounting_identity(spark):
    from tokenkit_spark.ops.events import growth_accounting

    rows = []
    # day1: users 1,2,3 (all new); day2: 2,3 retained + 4 new; 1 churns
    for u in (1, 2, 3):
        rows.append((dt.datetime(2024, 1, 1), u, "a", 1.0))
    for u in (2, 3, 4):
        rows.append((dt.datetime(2024, 1, 2), u, "a", 1.0))
    # day4: user 1 resurrects (gap day3)
    rows.append((dt.datetime(2024, 1, 4), 1, "a", 1.0))
    out = {r.day: r for r in growth_accounting(_ev(spark, rows))
           .collect()}
    d2 = out["2024-01-02"]
    assert d2.new_users == 1 and d2.retained == 2
    assert d2.resurrected == 0 and d2.churned == 1
    assert d2.dau == d2.new_users + d2.retained + d2.resurrected
    d4 = out["2024-01-04"]
    assert d4.resurrected == 1 and d4.new_users == 0
    # identity: every day's dau decomposes exactly
    for r in out.values():
        assert r.dau == r.new_users + r.retained + r.resurrected
