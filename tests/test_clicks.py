"""Click-log analytics (ops/clicks.py): position-bias CTR, COEC, PBM
attractiveness, cascade examination — hand-computed small cases plus
structural properties of the synthetic log."""

import pytest

from tokenkit_spark.ops.clicks import (
    cascade_examination,
    coec,
    pbm_attractiveness,
    position_ctr,
    synthetic_click_log,
)

LOG_SCHEMA = (
    "query_id long, session_id long, position int, doc_id long, "
    "rel int, clicked int"
)


def _log(spark, rows):
    return spark.createDataFrame(rows, LOG_SCHEMA)


def test_synthetic_log_deterministic_and_biased(spark):
    docs = spark.range(50).withColumnRenamed("id", "doc_id")
    log = synthetic_click_log(docs, 50)
    assert log.count() == 50 * 4 * 10
    a = sorted(map(tuple, log.collect()))
    b = sorted(map(tuple, synthetic_click_log(docs, 50).collect()))
    assert a == b
    curve = {r.position: r.ctr for r in position_ctr(log).collect()}
    # patience-bounded clicks: examination decays linearly, so the top
    # position must out-click the bottom one
    assert curve[1] > curve[10]


def test_position_ctr_hand_case(spark):
    # 2 impressions at position 1 (1 click), 2 at position 2 (0 clicks)
    rows = [
        (0, 0, 1, 10, 1, 1),
        (0, 1, 1, 11, 0, 0),
        (0, 0, 2, 12, 0, 0),
        (0, 1, 2, 13, 0, 0),
    ]
    out = {r.position: r for r in position_ctr(_log(spark, rows)).collect()}
    assert out[1].ctr == 0.5 and out[1].propensity == 1.0
    assert out[2].ctr == 0.0 and out[2].propensity == 0.0


def test_coec_rewards_deep_clicks(spark):
    # global curve: pos1 ctr=0.5, pos2 ctr=0.25. doc 99 is shown 5x at
    # position 2 and clicked 3x -> expected = 5*0.25, coec = 3/1.25
    rows = [(q, s, 1, q, 1, 1 if s == 0 else 0) for q in range(2)
            for s in range(2)]
    rows += [(9, s, 2, 99, 1, 1 if s < 3 else 0) for s in range(5)]
    rows += [(8, s, 2, 98, 0, 0) for s in range(3)]
    out = coec(_log(spark, rows), k=5, min_impressions=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 99 and r.impressions == 5 and r.clicks == 3
    assert r.expected_clicks == pytest.approx(5 * (3 / 8), abs=1e-6)
    assert r.coec == pytest.approx(3 / (5 * (3 / 8)), abs=1e-6)


def test_pbm_attractiveness_inverse_propensity(spark):
    # curve: pos1 ctr=1.0 (propensity 1); pos2 has 4 impressions / 3
    # clicks -> ctr 0.75 (propensity 0.75). pair (7, 42): 3 impressions
    # at pos2, 2 clicks -> alpha = 2 / (3*0.75) = 8/9 > raw ctr 2/3
    rows = [(q, 0, 1, q + 100, 1, 1) for q in range(4)]
    rows += [(7, s, 2, 42, 1, 1 if s < 2 else 0) for s in range(3)]
    rows += [(8, 0, 2, 43, 0, 1)]
    out = pbm_attractiveness(_log(spark, rows), k=5, min_impressions=3)
    got = [r for r in out.collect() if r.query_id == 7]
    assert len(got) == 1
    assert got[0].alpha == pytest.approx(8 / 9, abs=1e-6)


def test_cascade_examination_blocks_below_click(spark):
    # one SERP: click at position 2 -> positions 3,4 unexamined; a
    # click at position 3 exists in the log but is excluded from the
    # examined-CTR numerator (multi-click exclusion)
    rows = [
        (0, 0, 1, 1, 0, 0),
        (0, 0, 2, 2, 1, 1),
        (0, 0, 3, 3, 1, 1),
        (0, 0, 4, 4, 0, 0),
    ]
    out = {r.position: r
           for r in cascade_examination(_log(spark, rows)).collect()}
    assert out[1].examined == 1 and out[2].examined == 1
    assert out[3].examined == 0 and out[4].examined == 0
    assert out[2].ctr_examined == 1.0
    assert out[3].ctr_raw == 1.0 and out[3].ctr_examined == 0.0


def test_cascade_examined_decreasing_on_synthetic(spark):
    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    log = synthetic_click_log(docs, 40)
    rowsv = cascade_examination(log).orderBy("position").collect()
    ex = [r.examined for r in rowsv]
    assert all(a >= b for a, b in zip(ex, ex[1:]))
    assert ex[0] == 40 * 4  # top position always examined
