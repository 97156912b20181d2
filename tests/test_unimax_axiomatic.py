"""UniMax waterfill (ops/sampling.py), axiomatic similarities
(index/lmsim.py), vocab coverage (ops/textstats.py)."""

import math

import pytest

from tokenkit_spark.ops.sampling import unimax_allocation
from tokenkit_spark.ops.textstats import vocab_coverage


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _by_lang(df):
    return {r.lang: r for r in df.collect()}


def test_unimax_waterfill_hand_case(spark):
    # tokens: a=2, b=3, c=10 (caps 6, 9, 30 at 3 epochs);
    # budget = 1.2*15 = 18. candidates: i=1 L=6 (=cap_a feasible!),
    # level=6 -> alloc a=6, b=6, c=6 = 18. All equal: pure waterfill.
    rows = [
        (0, "a", "x y"),
        (1, "b", "x y z"),
        (2, "c", " ".join(["t"] * 10)),
    ]
    out = _by_lang(unimax_allocation(_docs(spark, rows), 3.0, 1.2))
    assert out["a"].alloc_tokens == pytest.approx(6.0)
    assert out["b"].alloc_tokens == pytest.approx(6.0)
    assert out["c"].alloc_tokens == pytest.approx(6.0)
    assert out["a"].epochs == pytest.approx(3.0)
    assert out["c"].epochs == pytest.approx(0.6)
    total = sum(r.alloc_tokens for r in out.values())
    assert total == pytest.approx(18.0)


def test_unimax_small_lang_capped(spark):
    # tokens: a=1 (cap 3), b=100 (cap 300); budget = 1.2*101 = 121.2
    # i=1: L = 60.6 > 3 -> infeasible; i=2: L = 118.2 <= 300 feasible.
    # a capped at 3 epochs, b gets the rest.
    rows = [(0, "a", "q"), (1, "b", " ".join(["t"] * 100))]
    out = _by_lang(unimax_allocation(_docs(spark, rows), 3.0, 1.2))
    assert out["a"].alloc_tokens == pytest.approx(3.0)
    assert out["b"].alloc_tokens == pytest.approx(118.2)
    assert out["a"].epochs == pytest.approx(3.0)
    assert out["b"].epochs == pytest.approx(1.182)


def test_unimax_budget_exceeds_caps(spark):
    # budget_ratio above max_epochs: every language capped
    rows = [(0, "a", "x y"), (1, "b", "x y z")]
    out = _by_lang(unimax_allocation(_docs(spark, rows), 2.0, 5.0))
    assert out["a"].alloc_tokens == pytest.approx(4.0)
    assert out["b"].alloc_tokens == pytest.approx(6.0)


def test_axiomatic_f2exp_values(spark):
    from tokenkit_spark.index.lmsim import axiomatic_f2exp

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "apple")], "query_id long, text string")
    out = axiomatic_f2exp(docs, qs, s=0.5, growth=0.35, k=5).collect()
    # doc 0: tf=2 dl=3 avgdl=2.5 N=2 df=1
    tfn = 2 / (2 + 0.5 + 0.5 * 3 / 2.5)
    expect = tfn * (2 / 1) ** 0.35
    assert out[0].doc_id == 0
    assert out[0].score == pytest.approx(round(expect, 4), abs=1e-4)
    assert len(out) == 1  # doc 1 has no query term


def test_axiomatic_f2log_values(spark):
    from tokenkit_spark.index.lmsim import axiomatic_f2log

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "banana")], "query_id long, text string")
    out = {r.doc_id: r for r in
           axiomatic_f2log(docs, qs, s=0.5, k=5).collect()}
    # banana: df=2, idf = ln(3/2); doc1 tf=1 dl=2
    tfn1 = 1 / (1 + 0.5 + 0.5 * 2 / 2.5)
    assert out[1].score == pytest.approx(
        round(tfn1 * math.log(3 / 2), 4), abs=1e-4
    )
    # shorter doc with same tf outranks (dl normalization)
    assert out[1].rank < out[0].rank


def test_vocab_coverage_rates(spark):
    # vocab_size=2 -> vocab = {x (4), y (3)}; z and w are OOV
    rows = [
        (0, "en", "x x y z"),
        (1, "en", "x y"),
        (2, "de", "x y w w"),
    ]
    out = _by_lang(vocab_coverage(_docs(spark, rows), vocab_size=2))
    en = out["en"]
    assert en.tokens == 6 and en.oov_tokens == 1
    assert en.oov_token_rate == pytest.approx(1 / 6, abs=1e-6)
    assert en.types == 3 and en.oov_types == 1
    de = out["de"]
    assert de.oov_tokens == 2 and de.oov_types == 1
    assert de.oov_type_rate == pytest.approx(1 / 3, abs=1e-6)
