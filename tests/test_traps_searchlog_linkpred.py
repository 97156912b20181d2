"""Crawl-trap signals (ops/traps.py), search-log analytics
(ops/searchlog.py), link-prediction battery (ops/linkgraph.py)."""

from pyspark.sql import functions as F

from tokenkit_spark.ops.linkgraph import link_prediction_battery
from tokenkit_spark.ops.searchlog import k_anonymity_audit, session_success
from tokenkit_spark.ops.traps import trap_signals, url_shape


# --------------------------------------------------------------- traps


def _urls(spark, rows):
    return spark.createDataFrame(rows, "host string, url string")


def test_url_shape_parsing(spark):
    rows = _urls(
        spark,
        [
            ("h", "https://h.ex/a/b/c?x=1&y=2"),
            ("h", "https://h.ex/a/b/a"),
            ("h", "https://h.ex/"),
        ],
    )
    out = {r.url: r for r in url_shape(rows).collect()}
    r1 = out["https://h.ex/a/b/c?x=1&y=2"]
    assert r1.depth == 3 and r1.n_params == 2 and not r1.has_repeat
    r2 = out["https://h.ex/a/b/a"]
    assert r2.depth == 3 and r2.has_repeat and r2.n_params == 0
    r3 = out["https://h.ex/"]
    assert r3.depth == 0 and not r3.has_repeat


def test_trap_signals_flags_deep_and_repeating_hosts(spark):
    deep = [("deep", "https://deep.ex/" + "/".join(f"s{i}" for i in range(9)))]
    rep = [("rep", f"https://rep.ex/a/b/a?i={i}") for i in range(4)]
    clean = [("ok", f"https://ok.ex/p/{i}") for i in range(4)]
    out = {
        r.host: r
        for r in trap_signals(
            _urls(spark, deep + rep + clean), depth_limit=6, repeat_frac=0.3
        ).collect()
    }
    assert out["deep"].trap_suspect and out["deep"].max_depth == 9
    assert out["rep"].trap_suspect and out["rep"].frac_repeat == 1.0
    assert not out["ok"].trap_suspect and out["ok"].avg_params == 0.0


# ----------------------------------------------------------- searchlog


def _qlog(spark, rows):
    return spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )


def test_session_success_metrics(spark):
    qlog = _qlog(
        spark,
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "b"),  # 1 reformulation
            (2, 1, "x"),
        ],
    )
    clicks = spark.createDataFrame(
        [(1, 2)], "session_id long, step long"
    )
    out = {r.session_id: r for r in session_success(qlog, clicks).collect()}
    s1 = out[1]
    assert s1.n_queries == 3 and s1.n_clicks == 1
    assert s1.n_reformulations == 1 and not s1.abandoned
    s2 = out[2]
    assert s2.n_clicks == 0 and s2.abandoned


def test_k_anonymity_audit_suppression(spark):
    # 'common' issued by 3 users, 'rare' by 1
    qlog = spark.createDataFrame(
        [
            (1, "common"), (2, "common"), (3, "common"), (1, "common"),
            (2, "rare"),
        ],
        "user_id long, query string",
    )
    r = k_anonymity_audit(qlog, k=3).collect()[0]
    assert r.k == 3 and r.n_rows == 5 and r.n_distinct_queries == 2
    assert r.n_suppressed_queries == 1 and r.n_suppressed_rows == 1
    assert abs(r.frac_rows_released - 0.8) < 1e-9


# ------------------------------------------------------ link prediction


def test_link_prediction_battery_scores(spark):
    # path graph 1-2-3 plus edge 1-4: candidates via shared neighbors
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], "src long, dst long"
    )
    out = {(r.src, r.dst): r for r in link_prediction_battery(e).collect()}
    # pair (1,3): common neighbor {2}, deg(1)=2 deg(3)=1
    r13 = out[(1, 3)]
    assert r13.cn == 1 and r13.pa == 2
    assert abs(r13.jaccard - 1 / 2) < 1e-6  # 1 / (2+1-1)
    # pair (2,4): common neighbor {1}, AA = 1/ln(deg 1 = 2)
    r24 = out[(2, 4)]
    import math

    assert abs(r24.aa - 1 / math.log(2)) < 1e-4
    # pair (3,4): shares neighbor-of-neighbor only -> absent
    assert (3, 4) not in out
