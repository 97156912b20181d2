"""Session-L batch 16: Holt-Winters, Markov order, KS test, lang/TLD,
idf drift, typo robustness."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ------------------------------------------------------------ holt-winters
def test_holt_winters_learns_weekly_season(spark):
    from tokenkit_spark.ops.movingfn import holt_winters_fit

    rows = []
    for day in range(1, 57):  # 8 full weeks
        n = 30 if (day - 1) % 7 == 0 else 5  # Mondays spike
        for _ in range(n):
            rows.append((dt.datetime(2024, 1, 1)
                         + dt.timedelta(days=day - 1, hours=12),
                         1, "a", 1.0))
    r = holt_winters_fit(_ev(spark, rows)).collect()[0]
    assert r.n_days == 56
    seasons = [getattr(r, f"season_{i}") for i in range(1, 8)]
    # exactly one seasonal slot carries the spike
    assert max(seasons) > 10
    assert sorted(seasons)[-2] < 5
    # the forecast for the spike slot exceeds the flat ones
    fcs = [r.forecast_1, r.forecast_2, r.forecast_3]
    assert max(fcs) - min(fcs) > 10


# ------------------------------------------------------------ markov order
def test_markov_order_gains_with_structure(spark):
    from tokenkit_spark.ops.searchlog import markov_order_eval

    # deterministic cycle a->b->c->a: order-1 is perfect, order-0 not
    rows = []
    for s in range(20):
        for i, q in enumerate(["a", "b", "c"] * 4):
            rows.append((s, i, q))
    qlog = spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )
    out = {r.markov_order: r for r in markov_order_eval(qlog).collect()}
    assert out[1].accuracy == 1.0
    assert out[2].accuracy == 1.0
    assert out[0].accuracy < 0.5
    assert out[1].n_contexts == 3


# ---------------------------------------------------------------- ks test
def test_ks_detects_distribution_shift(spark):
    from tokenkit_spark.ops.abtest import ks_test

    rows = []
    for u in range(400):
        # arm 1 (odd) shifted by +50
        v = float((u * 17) % 100) + (50.0 if u % 2 else 0.0)
        rows.append((dt.datetime(2024, 1, 1), u, "a", v))
    r = ks_test(_ev(spark, rows)).collect()[0]
    assert r.significant and r.d_stat > 0.3


def test_ks_same_distribution_not_significant(spark):
    from tokenkit_spark.ops.abtest import ks_test

    rows = [
        (dt.datetime(2024, 1, 1), u, "a", float((u // 2 * 17) % 100))
        for u in range(400)
    ]
    r = ks_test(_ev(spark, rows)).collect()[0]
    # identical per-arm values -> D = 0 (ties ordered arm-0-first can
    # give a tiny intermediate, but equal counts cancel at block ends)
    assert not r.significant


# ---------------------------------------------------------------- lang/tld
def test_lang_tld_mismatch(spark):
    from tokenkit_spark.ops.webclean import lang_tld_mismatch

    pages = spark.createDataFrame(
        [
            ("https://a.de/x", "de"),
            ("https://b.de/x", "en"),     # mismatch
            ("https://c.com/x", "en"),    # neutral gTLD
            ("https://d.jp/x", "ja"),
        ],
        "url string, lang string",
    )
    out = {r.tld: r for r in lang_tld_mismatch(pages).collect()}
    assert out["de"].n_match == 1 and out["de"].n_mismatch == 1
    assert out["de"].mismatch_rate == pytest.approx(0.5)
    assert out["com"].expected_lang is None
    assert out["com"].n_mismatch == 0
    assert out["jp"].n_match == 1


# --------------------------------------------------------------- idf drift
def test_idf_drift_ranks_changed_terms(spark):
    from tokenkit_spark.ops.snapshotdiff import idf_drift

    a = spark.createDataFrame(
        [(i, "stable words " + ("vanish " if i < 10 else "filler "))
         for i in range(40)],
        "doc_id long, text string",
    )
    # snapshot b: the 'vanish' docs are gone
    b = a.filter(F.col("doc_id") >= 10)
    out = idf_drift(a, b, k=5).collect()
    top = out[0]
    # the disappeared term moves the most
    assert top.term == "vanish"
    assert top.df_b == 0 and top.df_a == 10
    assert top.delta_idf > 1.0


# ---------------------------------------------------------- typo robustness
def test_typo_correction_recovers_ranking(spark):
    from tokenkit_spark.index.wordbreak import typo_robustness_audit

    docs = spark.createDataFrame(
        [(i, f"spark cluster w{i % 7}") for i in range(30)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "spark w3")], "query_id long, text string"
    )
    out = {r.mode: r for r in typo_robustness_audit(docs, q).collect()}
    # typo 'sark' matches nothing for that term; correction maps back
    # to 'spark' -> corrected run restores the clean ranking
    assert out["typo_corrected"].topk_overlap == 10
    assert out["typo_corrected"].top1_match == 1
    assert (
        out["typo_raw"].topk_overlap
        <= out["typo_corrected"].topk_overlap
    )
