"""moving_fn ewma/holt (ops/movingfn.py), Wilcoxon signed-rank
(index/rankeval.py), T5 span corruption (ops/spancorrupt.py)."""

import math

from pyspark.sql import functions as F

from tokenkit_spark.index.rankeval import wilcoxon_signed_rank
from tokenkit_spark.ops.movingfn import moving_fn
from tokenkit_spark.ops.spancorrupt import span_corrupt


# ---------------------------------------------------------- moving_fn


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts_s string"
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"))


def test_moving_fn_ewma_and_holt_recursions(spark):
    rows = [
        ("a", f"2024-01-0{d} 12:00:00")
        for d, k in [(1, 1), (2, 1), (3, 1)]
    ]
    # counts: day1=2, day2=1, day3=3
    rows = (
        [("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 11:00:00")]
        + [("a", "2024-01-02 10:00:00")]
        + [("a", "2024-01-03 10:00:00"), ("a", "2024-01-03 11:00:00"),
           ("a", "2024-01-03 12:00:00")]
    )
    out = {
        str(r.day): r
        for r in moving_fn(
            _events(spark, rows), window=5, alpha=0.3, beta=0.1
        ).collect()
    }
    # day1: empty trailing window
    assert out["2024-01-01"].ewma is None and out["2024-01-01"].holt is None
    # day2: window [2] -> seed
    assert out["2024-01-02"].ewma == 2.0
    assert out["2024-01-02"].holt == 2.0
    # day3: window [2,1]: ewma = 0.3*1 + 0.7*2 = 1.7
    assert abs(out["2024-01-03"].ewma - 1.7) < 1e-9
    # holt: l=0.3*1+0.7*(2+0)=1.7, b=0.1*(1.7-2)= -0.03 -> 1.67
    assert abs(out["2024-01-03"].holt - 1.67) < 1e-9


def test_moving_fn_zero_fills_gap_days(spark):
    rows = [("a", "2024-01-01 10:00:00"), ("a", "2024-01-03 10:00:00")]
    out = {
        str(r.day): r
        for r in moving_fn(_events(spark, rows), window=5).collect()
    }
    assert out["2024-01-02"].n == 0
    # day3 window [1, 0]: ewma = 0.3*0 + 0.7*1 = 0.7
    assert abs(out["2024-01-03"].ewma - 0.7) < 1e-9


# ----------------------------------------------------------- wilcoxon


def _metrics(spark, rows):
    return spark.createDataFrame(rows, "query_id long, metric double")


def test_wilcoxon_textbook_example(spark):
    # pairs with differences 1, -2, 3, 4 (no ties):
    # |d| ranks: 1->1, 2->2, 3->3, 4->4; W+ = 1+3+4 = 8, W- = 2
    a = _metrics(spark, [(0, 2.0), (1, 1.0), (2, 5.0), (3, 6.0)])
    b = _metrics(spark, [(0, 1.0), (1, 3.0), (2, 2.0), (3, 2.0)])
    r = wilcoxon_signed_rank(a, b).collect()[0]
    assert r.n_pairs == 4 and r.n_nonzero == 4
    assert r.w_plus == 8.0 and r.w_minus == 2.0
    # z = (8 - 4*5/4) / sqrt(4*5*9/24) = 3 / sqrt(7.5)
    assert abs(r.z - 3.0 / math.sqrt(7.5)) < 1e-6


def test_wilcoxon_average_ranks_for_ties(spark):
    # differences 1, -1, 2: |d| = 1,1,2 -> avg ranks 1.5, 1.5, 3
    a = _metrics(spark, [(0, 2.0), (1, 0.0), (2, 3.0)])
    b = _metrics(spark, [(0, 1.0), (1, 1.0), (2, 1.0)])
    r = wilcoxon_signed_rank(a, b).collect()[0]
    assert r.w_plus == 4.5 and r.w_minus == 1.5
    # tie correction: one tie group of 2 -> (8-2)/48 = 0.125
    var = 3 * 4 * 7 / 24 - (2 ** 3 - 2) / 48
    assert abs(r.z - (4.5 - 3.0) / math.sqrt(var)) < 1e-6


def test_wilcoxon_all_zero_differences(spark):
    a = _metrics(spark, [(0, 1.0), (1, 2.0)])
    r = wilcoxon_signed_rank(a, a).collect()[0]
    assert r.n_pairs == 2 and r.n_nonzero == 0
    assert r.w_plus == 0.0 and r.z is None


# ------------------------------------------------------ span corruption


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_corrupt_masks_pinned_spans(spark):
    # doc 0, cycle 7: spans 0, 7, 14… masked -> tokens 0-2, 21-23…
    text = " ".join(f"t{i}" for i in range(10))
    out = span_corrupt(_docs(spark, [(0, text)]), 3, 7).collect()[0]
    assert out.n_tokens == 10 and out.n_masked == 3 and out.n_spans == 1
    assert out.inputs == "<extra_id_0> " + " ".join(
        f"t{i}" for i in range(3, 10)
    )
    assert out.targets == "<extra_id_0> t0 t1 t2 <extra_id_1>"


def test_span_corrupt_mid_doc_span_and_sentinel_numbering(spark):
    # doc 1: spans 1, 8 masked -> tokens 3-5 and 24-26
    text = " ".join(f"w{i}" for i in range(27))
    out = span_corrupt(_docs(spark, [(1, text)]), 3, 7).collect()[0]
    assert out.n_masked == 6 and out.n_spans == 2
    assert "<extra_id_0>" in out.inputs and "<extra_id_1>" in out.inputs
    assert out.targets == (
        "<extra_id_0> w3 w4 w5 <extra_id_1> w24 w25 w26 <extra_id_2>"
    )
    assert "w3" not in out.inputs and "w24" not in out.inputs


def test_span_corrupt_no_masked_span_in_short_doc(spark):
    # doc 3: first masked span is span 3 = tokens 9-11; a 5-token doc
    # has spans 0-1 only -> nothing masked
    out = span_corrupt(_docs(spark, [(3, "a b c d e")]), 3, 7).collect()[0]
    assert out.n_masked == 0 and out.n_spans == 0
    assert out.inputs == "a b c d e"
    assert out.targets == "<extra_id_0>"


def test_span_corrupt_masked_fraction_near_target(spark):
    # long doc: 1/7 of spans masked -> ~14.3 % of tokens
    text = " ".join(f"x{i}" for i in range(2100))
    out = span_corrupt(_docs(spark, [(0, text)]), 3, 7).collect()[0]
    assert abs(out.n_masked / out.n_tokens - 1 / 7) < 0.01
