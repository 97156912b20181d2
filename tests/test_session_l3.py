"""Session-L batch 3: t-closeness, query intent, bidi audit, lexical
richness, Apdex, tracking-parameter audit."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ t-closeness
def _qlog(spark, rows):
    return spark.createDataFrame(
        rows,
        "session_id long, query string, domain string, sens_order long",
    )


def test_t_closeness_identical_distribution_passes(spark):
    from tokenkit_spark.ops.searchlog import t_closeness_audit

    # two groups with the same d0/d1 mix as the global table
    rows = []
    for g, q in enumerate(["qa", "qb"]):
        for u in range(4):
            rows.append((g * 10 + u, q, "d0", 0))
            rows.append((g * 10 + u, q, "d1", 1))
    out = t_closeness_audit(
        _qlog(spark, rows), t=0.01, k=3, user_col="session_id"
    ).collect()
    assert len(out) == 2
    assert all(r.emd == 0.0 and r.t_ok for r in out)


def test_t_closeness_skewed_group_fails(spark):
    from tokenkit_spark.ops.searchlog import t_closeness_audit

    rows = []
    # qa: all d0; qb: all d1 -> each far from the 50/50 global
    for u in range(4):
        rows.append((u, "qa", "d0", 0))
        rows.append((100 + u, "qb", "d1", 1))
    out = {r.query: r for r in t_closeness_audit(
        _qlog(spark, rows), t=0.3, k=3, user_col="session_id"
    ).collect()}
    # ordered EMD with m=2: |p0-q0| = 0.5 for both groups
    assert out["qa"].emd == pytest.approx(0.5)
    assert out["qb"].emd == pytest.approx(0.5)
    assert not out["qa"].t_ok and not out["qb"].t_ok


# ------------------------------------------------------------ query intent
def test_query_intent_classes(spark):
    from tokenkit_spark.ops.searchlog import query_intent

    rows = []
    # navigational: 9/10 clicks on one domain
    rows += [(u, "facebook", "d0", 0) for u in range(9)]
    rows.append((9, "facebook", "d1", 1))
    # informational: spread over 4 domains
    rows += [(u, "history of rome", f"d{u % 4}", 0) for u in range(8)]
    # transactional by cue term
    rows += [(u, "download spark", f"d{u % 3}", 0) for u in range(6)]
    out = {r.query: r for r in query_intent(
        _qlog(spark, rows), user_col="session_id"
    ).collect()}
    assert out["facebook"].intent == "navigational"
    assert out["facebook"].top_share == pytest.approx(0.9)
    assert out["history of rome"].intent == "informational"
    assert out["download spark"].intent == "transactional"
    # entropy: uniform over 4 domains of 2 -> ln 4
    import math

    assert out["history of rome"].click_entropy == pytest.approx(
        math.log(4), abs=1e-5
    )


# -------------------------------------------------------------- bidi audit
def test_bidi_audit_counts_and_balance(spark):
    from tokenkit_spark.ops.webclean import bidi_audit

    docs = spark.createDataFrame(
        [
            ("s1", "clean text"),
            ("s1", "evil ‮ reversed"),          # dangling RLO
            ("s1", "ok ‪ x ‬ balanced"),   # balanced LRE
            ("s2", "zero​width"),
            ("s2", "iso ⁦ only"),               # dangling LRI
        ],
        "source string, text string",
    )
    out = {r.grp: r for r in bidi_audit(docs).collect()}
    assert out["s1"].docs_bidi == 2
    assert out["s1"].docs_unbalanced == 1
    assert out["s1"].chars_bidi == 3  # RLO + LRE + PDF
    assert out["s1"].docs_invis == 0
    assert out["s2"].docs_invis == 1
    assert out["s2"].docs_unbalanced == 1
    assert out["s2"].frac_affected == pytest.approx(1.0)


# -------------------------------------------------------- lexical richness
def test_lexical_richness_hand_computed(spark):
    from tokenkit_spark.ops.textstats import lexical_richness

    # corpus: a a a b b c -> N=6, V=3, V1=1 (c), V2=1 (b), V3=1 (a)
    docs = spark.createDataFrame(
        [("s", "a a a b b c")], "source string, text string"
    )
    r = lexical_richness(docs).collect()[0]
    assert r.n_tokens == 6 and r.n_types == 3
    assert r.ttr == pytest.approx(0.5)
    assert r.hapax_rate == pytest.approx(1 / 3, abs=1e-5)
    # yule K = 1e4 * (sum m^2 Vm - N)/N^2 = 1e4 * (9+4+1-6)/36
    assert r.yule_k == pytest.approx(10000 * 8 / 36, abs=1e-3)
    # simpson D = sum Vm*m*(m-1) / (N(N-1)) = (6+2)/30
    assert r.simpson_d == pytest.approx(8 / 30, abs=1e-5)


def test_lexical_richness_repetitive_source_low_diversity(spark):
    from tokenkit_spark.ops.textstats import lexical_richness

    docs = spark.createDataFrame(
        [("tmpl", "buy now " * 50), ("organic", " ".join(
            f"w{i}" for i in range(100)
        ))],
        "source string, text string",
    )
    out = {r.grp: r for r in lexical_richness(docs).collect()}
    assert out["tmpl"].yule_k > 100 * out["organic"].yule_k
    assert out["organic"].hapax_rate == pytest.approx(1.0)


# ------------------------------------------------------------------- apdex
def test_apdex_bands(spark):
    from tokenkit_spark.ops.events import apdex_scores

    import datetime as dt

    rows = (
        [(dt.datetime(2024, 1, 1), 1, "fast", 50.0)] * 97
        + [(dt.datetime(2024, 1, 1), 1, "fast", 900.0)] * 3
        + [(dt.datetime(2024, 1, 1), 1, "slow", 250.0)] * 10
    )
    ev = spark.createDataFrame(
        rows,
        "ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.grp: r for r in apdex_scores(ev, threshold_t=100.0).collect()}
    assert out["fast"].apdex == pytest.approx(0.97)
    assert out["fast"].rating == "excellent"
    # all tolerating -> apdex 0.5 -> 'poor'
    assert out["slow"].n_tolerating == 10
    assert out["slow"].apdex == pytest.approx(0.5)
    assert out["slow"].rating == "poor"


# --------------------------------------------------------- tracking params
def test_tracking_param_strip_and_gain(spark):
    from tokenkit_spark.ops.dust import tracking_param_audit

    pages = spark.createDataFrame(
        [
            ("h1", "https://h1.ex/a?utm_source=x&id=1"),
            ("h1", "https://h1.ex/a?utm_source=y&id=1"),
            ("h1", "https://h1.ex/a?id=1"),
            ("h1", "https://h1.ex/b?gclid=zzz"),
            ("h1", "https://h1.ex/b"),
            ("h1", "https://h1.ex/c?ref=tw"),
        ],
        "host string, url string",
    )
    r = tracking_param_audit(pages).collect()[0]
    assert r.n_urls == 6
    assert r.n_with_tracking == 4
    assert r.n_distinct_raw == 6
    # stripped: /a?id=1, /b, /c -> 3 distinct
    assert r.n_distinct_stripped == 3
    assert r.dup_gain == pytest.approx(0.5)


def test_tracking_param_keeps_non_tracking_order(spark):
    from tokenkit_spark.ops.dust import tracking_param_audit

    pages = spark.createDataFrame(
        [
            ("h", "https://h.ex/p?b=2&utm_medium=m&a=1"),
            ("h", "https://h.ex/p?b=2&a=1"),
        ],
        "host string, url string",
    )
    r = tracking_param_audit(pages).collect()[0]
    # strip preserves the b=2&a=1 order -> the two URLs collide
    assert r.n_distinct_stripped == 1
