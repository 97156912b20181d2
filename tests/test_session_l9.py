"""Session-L batch 9: reformulation taxonomy, dwell SAT, host
h-index, RFM, LTV curve, burstiness."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ----------------------------------------------------------- reformulations
def test_reformulation_classes(spark):
    from tokenkit_spark.ops.searchlog import reformulation_taxonomy

    qlog = spark.createDataFrame(
        [
            (1, 1, "spark join"),
            (1, 2, "spark join"),          # repeat
            (1, 3, "spark join hints"),    # specialization
            (1, 4, "spark join"),          # generalization
            (1, 5, "spark sql"),           # reformulation (overlap)
            (1, 6, "weather tomorrow"),    # new intent
        ],
        "session_id long, step long, query string",
    )
    out = {r.move: r.n for r in reformulation_taxonomy(qlog).collect()}
    assert out == {
        "repeat": 1,
        "specialization": 1,
        "generalization": 1,
        "reformulation": 1,
        "new_intent": 1,
    }


# ----------------------------------------------------------------- dwell sat
def test_dwell_sat_labels(spark):
    from tokenkit_spark.ops.searchlog import dwell_satisfaction

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    qlog = spark.createDataFrame(
        [
            (1, base),                                   # dwell 45s -> sat
            (1, base + dt.timedelta(seconds=45)),        # dwell 5s  -> qb
            (1, base + dt.timedelta(seconds=50)),        # dwell 20s -> mid
            (1, base + dt.timedelta(seconds=70)),        # last
        ],
        "session_id long, ts timestamp",
    )
    r = dwell_satisfaction(qlog).collect()[0]
    assert r.n_clicks == 4
    assert r.n_sat == 1 and r.n_quickback == 1 and r.n_last == 1
    assert r.sat_rate == pytest.approx(0.5)


# --------------------------------------------------------------- host h-index
def test_host_h_index(spark):
    from tokenkit_spark.ops.linkgraph import host_h_index

    # host A pages 10, 20, 30 with inlinks 5, 2, 1 -> h = 2
    edges = []
    for src in range(100, 105):
        edges.append((src, 10))
    edges += [(200, 20), (201, 20)]
    edges.append((300, 30))
    e = spark.createDataFrame(edges, "src long, dst long")
    out = host_h_index(e, F.lit("A")).collect()[0]
    assert out.n_pages == 3 and out.max_inlinks == 5
    assert out.h_index == 2


# ---------------------------------------------------------------------- rfm
def test_rfm_scores_order(spark):
    from tokenkit_spark.ops.events import rfm_segments

    rows = []
    # user u has u+1 events, most recent day scales with u
    for u in range(10):
        for j in range(u + 1):
            rows.append(
                (dt.datetime(2024, 1, 1 + u), u, "a", float(10 * (u + 1)))
            )
    out = {r.user_id: r for r in rfm_segments(_ev(spark, rows)).collect()}
    # most active+recent+valuable user gets top scores
    assert out[9].r_score == 5 and out[9].f_score == 5
    assert out[9].m_score == 5 and out[9].rfm == "555"
    assert out[0].r_score == 1 and out[0].f_score == 1
    # quintiles of 10 users -> 2 users per tile
    assert sum(1 for r in out.values() if r.f_score == 3) == 2


# ---------------------------------------------------------------- ltv curve
def test_ltv_cumulative_per_user(spark):
    from tokenkit_spark.ops.events import ltv_curve

    rows = []
    # cohort of 2 users starting Mon Jan 1; spend 10 each in week 0,
    # 5 each in week 1
    for u in (1, 2):
        rows.append((dt.datetime(2024, 1, 2), u, "buy", 10.0))
        rows.append((dt.datetime(2024, 1, 9), u, "buy", 5.0))
    out = {r.week_age: r for r in ltv_curve(_ev(spark, rows)).collect()}
    assert out[0].cohort_users == 2
    assert out[0].cum_value_per_user == pytest.approx(10.0)
    assert out[1].cum_value == pytest.approx(30.0)
    assert out[1].cum_value_per_user == pytest.approx(15.0)


# --------------------------------------------------------------- burstiness
def test_burstiness_periodic_vs_bursty(spark):
    from tokenkit_spark.ops.events import burstiness_params

    rows = []
    base = dt.datetime(2024, 1, 1)
    # periodic: every 60s
    for i in range(50):
        rows.append(
            (base + dt.timedelta(seconds=60 * i), 1, "periodic", 1.0)
        )
    # bursty: tight bursts separated by long gaps
    t = base
    eid = 0
    for burst in range(10):
        for j in range(5):
            t += dt.timedelta(seconds=1)
            rows.append((t, 1, "bursty", 1.0))
        t += dt.timedelta(seconds=600)
    ev = spark.createDataFrame(
        [(i, r[0], r[1], r[2], r[3]) for i, r in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {r.grp: r for r in burstiness_params(ev).collect()}
    # periodic series: sigma = 0 -> B = -1
    assert out["periodic"].burstiness == pytest.approx(-1.0)
    # bursty series: B well above periodic
    assert out["bursty"].burstiness > 0.3
    assert out["bursty"].cv > 1.0
