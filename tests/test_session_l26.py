"""Session-L batch 26: edge embeddedness, power analysis, Simpson's
check."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


def test_edge_embeddedness_bridge_vs_triangle(spark):
    from tokenkit_spark.ops.linkgraph import edge_embeddedness

    edges = spark.createDataFrame(
        # triangle 1-2-3 plus a bridge 3-4
        [(1, 2), (2, 3), (1, 3), (3, 4)],
        "src long, dst long",
    )
    out = {(r.src, r.dst): r for r in edge_embeddedness(
        edges, k=10
    ).collect()}
    # triangle edges have embeddedness 1 (the third vertex)
    assert out[(1, 2)].embeddedness == 1
    # the bridge has none
    assert out[(3, 4)].embeddedness == 0
    assert out[(3, 4)].n_bridges == 1
    assert out[(3, 4)].bridge_frac == pytest.approx(0.25)


def test_power_analysis_scaling(spark):
    from tokenkit_spark.ops.abtest import power_analysis

    rows = []
    for u in range(500):
        rows.append(
            (dt.datetime(2024, 1, 1), u, "a", 100.0 + (u % 21) - 10)
        )
    out = {r.mde_rel: r for r in power_analysis(_ev(spark, rows))
           .collect()}
    # smaller MDE needs quadratically more users
    assert out[0.01].n_per_arm_required > out[0.05].n_per_arm_required
    ratio = out[0.01].n_per_arm_required / out[0.05].n_per_arm_required
    assert ratio == pytest.approx(25, rel=0.05)
    # tiny variance relative to a 1% effect on mean 100: runnable at 10%
    assert out[0.10].runnable


def test_simpsons_aggregate_consistency(spark):
    from tokenkit_spark.ops.abtest import simpsons_check

    rows = []
    # single stratum, arm 1 clearly better
    for u in range(100):
        rows.append((dt.datetime(2024, 1, 2), u, "view", 1.0))
        if u % 2 == 1 and u % 3 != 0:
            rows.append((dt.datetime(2024, 1, 3), u, "purchase", 1.0))
        if u % 2 == 0 and u % 10 == 0:
            rows.append((dt.datetime(2024, 1, 3), u, "purchase", 1.0))
    out = {r.stratum: r for r in simpsons_check(_ev(spark, rows))
           .collect()}
    ov = out["overall"]
    assert ov.diff > 0
    # only one stratum -> it must agree with the aggregate
    strata = [r for k, r in out.items() if k != "overall"]
    assert all(r.agrees_with_overall for r in strata)
