"""Session-L batch 13: spell-recall harness, char entropy orders,
merge normalization, novelty curve, attribution, Hill tail."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ------------------------------------------------------------- spell recall
def test_spell_recall_recovers_planted_typos(spark):
    from tokenkit_spark.index.wordbreak import spell_recall_eval

    words = [
        "table", "query", "spark", "merge", "window", "stream",
        "batch", "shuffle", "join", "filter", "group", "order",
        "value", "column", "record",
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(words) + f" w{i}") for i in range(5)],
        "doc_id long, text string",
    )
    r = spell_recall_eval(docs, typo_mod=3).collect()[0]
    assert r.n_planted > 0
    # vocabulary words are far apart -> the deletion typo maps back
    assert r.top1_acc == 1.0
    assert r.recall_any == 1.0


# --------------------------------------------------------- char entropy
def test_char_entropy_uniform_vs_repetitive(spark):
    from tokenkit_spark.ops.textstats import char_entropy_orders

    docs = spark.createDataFrame(
        [
            ("rep", "ababababababababababababab"),
            ("mix", "the quick brown fox jumps over lazy dogs"),
        ],
        "source string, text string",
    )
    out = {r.grp: r for r in char_entropy_orders(docs).collect()}
    # alternating ab: H0 = 1 bit, H1 ~ 0 (fully predictable)
    assert out["rep"].h0_bits == pytest.approx(1.0, abs=0.01)
    assert out["rep"].h1_bits < 0.1
    assert out["rep"].redundancy > 0.9
    assert out["mix"].h0_bits > 3.0


# ------------------------------------------------------------- merge norm
def test_merge_norm_schemes_present_and_bounded(spark):
    from tokenkit_spark.index.hybrid import merge_normalization_audit

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 11} w{(i * 3) % 17}") for i in range(80)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "alpha w3")], "query_id long, text string"
    )
    out = {r.scheme: r for r in merge_normalization_audit(
        docs, q, n_shards=4, k=5
    ).collect()}
    assert set(out) == {"raw", "minmax", "zscore"}
    for r in out.values():
        assert 0 <= r.topk_overlap <= 5


# ------------------------------------------------------------ novelty curve
def test_novelty_decays_with_duplication(spark):
    from tokenkit_spark.ops.textstats import novelty_curve

    # second half duplicates the first half's content
    docs = spark.createDataFrame(
        [(i, f"unique{i} content piece number {i} here") for i in range(20)]
        + [(20 + i, f"unique{i} content piece number {i} here")
           for i in range(20)],
        "doc_id long, text string",
    )
    out = sorted(
        novelty_curve(docs, n_bins=4).collect(), key=lambda r: r.bucket
    )
    # bucket 0 is mostly novel (one template trigram repeats across
    # docs, so not exactly 1.0)
    assert out[0].novelty_rate > 0.7
    # last buckets are pure repeats
    assert out[-1].novelty_rate == 0.0


# -------------------------------------------------------------- attribution
def test_attribution_models_credit(spark):
    from tokenkit_spark.ops.events import attribution_models

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base, 1, "ad", 1.0),
        (base + dt.timedelta(hours=1), 1, "email", 1.0),
        (base + dt.timedelta(hours=2), 1, "search", 1.0),
        (base + dt.timedelta(hours=3), 1, "purchase", 1.0),
    ]
    out = {r.channel: r for r in attribution_models(
        _ev(spark, rows)
    ).collect()}
    assert out["ad"].first_touch == 1.0 and out["ad"].last_touch == 0.0
    assert out["search"].last_touch == 1.0
    assert out["email"].linear == pytest.approx(1 / 3, abs=1e-5)
    # U-shape: 0.4 / 0.2 / 0.4
    assert out["ad"].u_shaped == pytest.approx(0.4)
    assert out["email"].u_shaped == pytest.approx(0.2)
    assert out["search"].u_shaped == pytest.approx(0.4)


# ---------------------------------------------------------------- hill tail
def test_hill_estimates_pareto_alpha(spark):
    from tokenkit_spark.ops.events import hill_tail_estimator

    # exact Pareto(alpha=2) quantiles: x_q = (1-q)^(-1/2)
    rows = []
    n = 2000
    for i in range(n):
        q = (i + 0.5) / n
        rows.append(
            (dt.datetime(2024, 1, 1), i, "pareto", (1 - q) ** -0.5)
        )
    r = hill_tail_estimator(_ev(spark, rows), k_frac=0.05).collect()[0]
    assert r.alpha_hat == pytest.approx(2.0, rel=0.15)
    assert r.infinite_variance  # alpha <= 2


def test_hill_light_tail_large_alpha(spark):
    from tokenkit_spark.ops.events import hill_tail_estimator

    # near-uniform values -> very light tail -> alpha >> 2
    rows = [
        (dt.datetime(2024, 1, 1), i, "unif", 100.0 + (i % 50) / 10.0)
        for i in range(1000)
    ]
    r = hill_tail_estimator(_ev(spark, rows)).collect()[0]
    assert r.alpha_hat > 10
    assert not r.infinite_variance
