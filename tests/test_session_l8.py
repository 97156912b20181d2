"""Session-L batch 8: STC clusters, link hygiene, max-min fair,
fan-out tail, delta-method CI, planted-dup recall."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# ------------------------------------------------------------ stc clusters
def test_stc_finds_shared_phrase(spark):
    from tokenkit_spark.index.stc import stc_base_clusters

    docs = spark.createDataFrame(
        [
            (0, "apache spark streaming engine"),
            (1, "apache spark batch engine"),
            (2, "apache spark sql"),
            (3, "unrelated content here"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "spark")], "query_id long, text string")
    out = stc_base_clusters(docs, q, k=10, n_clusters=5).collect()
    phrases = {r.phrase: r for r in out}
    assert "apache spark" in phrases
    assert phrases["apache spark"].n_docs == 3
    # 2-word phrase shared by 3 docs -> score 6
    assert phrases["apache spark"].score == 6


def test_stc_min_support_gate(spark):
    from tokenkit_spark.index.stc import stc_base_clusters

    docs = spark.createDataFrame(
        [(0, "unique phrase one x"), (1, "different words two x")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "x")], "query_id long, text string")
    out = stc_base_clusters(docs, q, k=10, n_clusters=5).collect()
    # no phrase shared by >= 2 docs
    assert out == []


# ------------------------------------------------------------ link hygiene
def test_link_hygiene_counts(spark):
    from tokenkit_spark.ops.linkgraph import link_hygiene

    pages = spark.createDataFrame(
        [(i,) for i in range(5)], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 99)], "src long, dst long"
    )
    r = link_hygiene(edges, pages).collect()[0]
    assert r.n_pages == 5 and r.n_edges == 3
    # inlinked: 1, 2 -> orphans: 0, 3, 4
    assert r.n_orphans == 3
    # out-linkers: 0, 1, 2 -> sinks: 3, 4
    assert r.n_sinks == 2
    # edge to 99 dangles
    assert r.n_dangling_edges == 1
    assert r.frac_dangling == pytest.approx(1 / 3, abs=1e-5)


# ------------------------------------------------------------- maxmin fair
def test_maxmin_fair_water_level(spark):
    from tokenkit_spark.ops.frontier import maxmin_fair_budget

    demands = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 100.0), ("d", 100.0)],
        "host string, demand double",
    )
    out = {r.host: r for r in maxmin_fair_budget(
        demands, capacity=90.0
    ).collect()}
    # a, b fit fully; remaining 60 split equally between c and d
    assert out["a"].allocation == 10.0 and not out["a"].saturated
    assert out["b"].allocation == 20.0 and not out["b"].saturated
    assert out["c"].allocation == 30.0 and out["c"].saturated
    assert out["d"].allocation == 30.0
    assert sum(r.allocation for r in out.values()) == pytest.approx(90.0)


def test_maxmin_fair_unsaturated(spark):
    from tokenkit_spark.ops.frontier import maxmin_fair_budget

    demands = spark.createDataFrame(
        [("a", 5.0), ("b", 6.0)], "host string, demand double"
    )
    out = maxmin_fair_budget(demands, capacity=100.0).collect()
    assert all(r.allocation == r.demand for r in out)
    assert all(not r.saturated for r in out)
    assert all(r.level is None for r in out)


# ------------------------------------------------------------- fanout tail
def test_fanout_tail_amplification(spark):
    from tokenkit_spark.index.hedging import fanout_tail_audit

    # shard latency: uniform over 10..400 by construction
    rows = [
        (dt.datetime(2024, 1, 1), u, "rpc", float(10 + (u * 13) % 390))
        for u in range(4000)
    ]
    out = {r.fanout: r for r in fanout_tail_audit(
        _ev(spark, rows), fanouts=(1, 8)
    ).collect()}
    # completion probability at the single-shard p99 decays with fanout
    assert out[8].p_at_single_p99 < out[1].p_at_single_p99
    # hence the fan-out p99 latency is no better
    assert out[8].p_target_latency >= out[1].p_target_latency


# ---------------------------------------------------------------- delta ci
def test_delta_method_ratio_and_ci(spark):
    from tokenkit_spark.ops.abtest import delta_method_ci

    rows = []
    for u in range(60):
        views = 4 + u % 3
        clicks = 1 + (u % 2)
        for _ in range(views):
            rows.append((dt.datetime(2024, 1, 1), u, "view", 1.0))
        for _ in range(clicks):
            rows.append((dt.datetime(2024, 1, 1), u, "click", 1.0))
    out = delta_method_ci(_ev(spark, rows), "click", "view").collect()
    assert len(out) == 2
    for r in out:
        # ratio equals total clicks / total views for the arm
        assert 0 < r.ratio < 1
        assert r.ci_lo < r.ratio < r.ci_hi
        assert r.se > 0


# ------------------------------------------------------------ dedup recall
def test_planted_dup_eval_high_recall(spark):
    from tokenkit_spark.ops.dedup import planted_dup_eval

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 17 + j) % 200}" for j in range(40)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    r = planted_dup_eval(docs).collect()[0]
    assert r.n_planted == 4
    # dropping 1-in-7 words keeps containment far above 0.5
    assert r.recall == 1.0
    assert r.n_detected >= r.n_hits
