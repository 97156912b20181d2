"""Session-L batch 25: LSM plan, dictionary encoding, tie audit."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_lsm_plan_tradeoffs(spark):
    from tokenkit_spark.index.logmerge import lsm_write_amp_plan

    docs = spark.createDataFrame(
        [(i, 10 * 1024 * 1024) for i in range(100)],  # 1000 MB
        "doc_id long, n_chars long",
    )
    out = {r.fanout: r for r in lsm_write_amp_plan(
        docs, buffer_mb=64.0
    ).collect()}
    for r in out.values():
        # leveled always writes more, reads fewer runs
        assert r.leveled_write_amp >= r.tiered_write_amp
        assert r.leveled_read_runs <= r.tiered_read_runs
    # bigger fanout -> fewer levels
    assert out[16].levels <= out[4].levels


def test_dict_encoding_low_cardinality_wins(spark):
    from tokenkit_spark.index.layout import dict_encoding_plan

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), i, ["click", "view"][i % 2], 1.0)
         for i in range(100)],
        "ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.column: r for r in dict_encoding_plan(
        ev, columns=("event_type", "user_id")
    ).collect()}
    # 2 distinct types -> 1 bit/value vs 8*~5 bits plain
    assert out["event_type"].dict_bits_per_value == 1
    assert out["event_type"].compression_ratio > 30
    # 100 distinct ids -> 7 bits vs 64
    assert out["user_id"].dict_bits_per_value == 7
    assert out["user_id"].compression_ratio == pytest.approx(64 / 7,
                                                             abs=0.01)


def test_tie_audit_detects_ties(spark):
    from tokenkit_spark.index.rankeval import score_tie_audit

    # ten identical docs -> every top-k boundary is a tie
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(10)]
        + [(99, "unique different words")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "same"), (1, "unique")], "query_id long, text string"
    )
    out = {r.query_id: r for r in score_tie_audit(
        docs, q, k=10
    ).collect()}
    assert out[0].n_tied_boundaries == 9
    assert out[0].max_tie_block == 10
    assert out[0].top1_tied
    assert out[1].n_tied_boundaries == 0
    assert not out[1].top1_tied
