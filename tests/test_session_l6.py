"""Session-L batch 6: wildcard dictionaries, ACF/Ljung-Box, galloping
intersection, two-proportion z, positional overhead."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# --------------------------------------------------------- wildcard index
def test_wildcard_permuterm_is_exact_kgram_overshoots(spark):
    from tokenkit_spark.index.wildcardindex import wildcard_index_audit

    docs = spark.createDataFrame(
        [(0, "moon mon month money dark den")],
        "doc_id long, text string",
    )
    pats = spark.createDataFrame(
        [(0, "mo*n"), (1, "zz*")], "query_id long, pattern string"
    )
    out = {r.pattern: r for r in wildcard_index_audit(
        docs, pats, k=3
    ).collect()}
    r = out["mo*n"]
    # exact: moon, mon  (month/money end wrong; den/dark no prefix)
    assert r.n_exact == 2
    # permuterm prefix scan n$mo* is exact for single-*
    assert r.n_permuterm == 2
    # k-gram conjunction {$mo} admits month/money too
    assert r.n_kgram_raw == 4 and r.n_kgram_filtered == 2
    assert r.kgram_precision == pytest.approx(0.5)
    assert out["zz*"].n_exact == 0 and out["zz*"].n_permuterm == 0


def test_wildcard_gramless_pattern_scans_vocab(spark):
    from tokenkit_spark.index.wildcardindex import wildcard_index_audit

    docs = spark.createDataFrame(
        [(0, "ax bx cx dx")], "doc_id long, text string"
    )
    pats = spark.createDataFrame(
        [(0, "a*x")], "query_id long, pattern string"
    )
    r = wildcard_index_audit(docs, pats, k=3).collect()[0]
    # halves '$a' / 'x$' are shorter than k -> no grams -> full vocab
    assert r.n_kgram_raw == 4
    assert r.n_exact == 1 and r.n_kgram_filtered == 1


def test_dictionary_blowup_counts(spark):
    from tokenkit_spark.index.wildcardindex import dictionary_blowup

    docs = spark.createDataFrame(
        [(0, "ab abc")], "doc_id long, text string"
    )
    r = dictionary_blowup(docs, k=3).collect()[0]
    assert r.n_terms == 2
    # rotations: len+1 each -> 3 + 4
    assert r.n_rotations == 7
    # $ab$ -> {$ab, ab$} ; $abc$ -> {$ab, abc, bc$} -> 2 + 3 postings
    assert r.n_gram_postings == 5


# ------------------------------------------------------------ acf/ljungbox
def test_acf_weekly_cycle_peaks_at_lag7(spark):
    from tokenkit_spark.ops.trend import acf_ljung_box

    rows = []
    for day in range(1, 29):
        n = 20 if (day - 1) % 7 in (5, 6) else 5
        for _ in range(n):
            rows.append((dt.datetime(2024, 1, day, 12, 0), 1, "a", 1.0))
    out = {r.lag: r for r in acf_ljung_box(
        _ev(spark, rows), max_lag=8
    ).collect()}
    # strong positive autocorrelation at the seasonal lag
    assert out[7].acf > 0.6
    assert out[7].acf > out[3].acf
    assert out[7].q_signif


def test_acf_constant_series_zero(spark):
    from tokenkit_spark.ops.trend import acf_ljung_box

    rows = []
    for day in range(1, 15):
        for _ in range(3):
            rows.append((dt.datetime(2024, 1, day, 12, 0), 1, "a", 1.0))
    out = acf_ljung_box(_ev(spark, rows), max_lag=3).collect()
    # zero variance -> ss = 0 -> r undefined; accept NaN/0 rows but
    # no crash and correct row count
    assert len(out) == 3


# ---------------------------------------------------------------- galloping
def test_galloping_beats_merge_on_lopsided_lists(spark):
    from tokenkit_spark.index.intersect import galloping_audit

    # 'rare' in 3 docs, 'common' in 200
    rows = [(i, "common filler") for i in range(200)]
    for i in (10, 90, 180):
        rows[i] = (i, "common rare filler")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "rare common")], "query_id long, text string"
    )
    r = galloping_audit(docs, q).collect()[0]
    assert r.m == 3 and r.n == 200
    assert r.cost_merge == 203
    # 3 gallops of <= 2*log2(200)+2 each ~ 50, far below 203
    assert r.cost_gallop < r.cost_merge
    assert r.gallop_ratio < 0.5


def test_galloping_cost_formula_hand_check(spark):
    from tokenkit_spark.index.intersect import galloping_audit

    # short list {0, 8}; long list docs 0..15 ('b' in all 16)
    rows = [(i, "b") for i in range(16)]
    rows[0] = (0, "a b")
    rows[8] = (8, "a b")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(0, "a b")], "query_id long, text string")
    r = galloping_audit(docs, q).collect()[0]
    # probes at long positions 1 and 9 -> jumps 1, 8
    # cost = (2*0+2) + (2*3+2) = 10
    assert r.cost_gallop == 10


# -------------------------------------------------------------- prop z-test
def test_prop_ztest_detects_large_difference(spark):
    from tokenkit_spark.ops.abtest import prop_ztest

    rows = []
    for u in range(200):
        rows.append((dt.datetime(2024, 1, 1), u, "view", 1.0))
        # arm 1 (odd users) converts 60%, arm 0 converts 20%
        conv = (u % 5 < 3) if u % 2 == 1 else (u % 5 < 1)
        if conv:
            rows.append((dt.datetime(2024, 1, 2), u, "purchase", 1.0))
    r = prop_ztest(_ev(spark, rows), "purchase").collect()[0]
    assert r.n0 == 100 and r.n1 == 100
    assert r.p1 > r.p0
    assert r.significant


def test_prop_ztest_degenerate_all_convert(spark):
    from tokenkit_spark.ops.abtest import prop_ztest

    rows = [(dt.datetime(2024, 1, 1), u, "purchase", 1.0) for u in range(20)]
    r = prop_ztest(_ev(spark, rows), "purchase").collect()[0]
    assert r.p_pool == 1.0 and r.z == 0.0 and not r.significant


# ------------------------------------------------------ positional overhead
def test_positions_overhead_exact_bytes(spark):
    from tokenkit_spark.index.layout import positional_overhead_audit

    # one term, one doc, positions 1,2,3 -> pos gaps 1,1,1 -> 3 bytes
    docs = spark.createDataFrame(
        [(5, "x x x")], "doc_id long, text string"
    )
    r = positional_overhead_audit(docs).collect()[0]
    assert r.term == "x" and r.df == 1 and r.n_positions == 3
    # doc stream: doc gap 5 (1B) + tf 3 (1B) = 2
    assert r.doc_bytes == 2 and r.pos_bytes == 3
    assert r.overhead_x == pytest.approx(2.5)


def test_positions_overhead_in_iir_range_on_text(spark):
    from tokenkit_spark.index.layout import positional_overhead_audit

    docs = spark.createDataFrame(
        [(i, ("alpha beta " * 5) + f"w{i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = positional_overhead_audit(docs, k=2).collect()
    # frequent terms: positional clearly dominates docs-only storage
    assert all(r.overhead_x > 2.0 for r in out)
