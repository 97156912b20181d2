"""Consistent-hash reshard audit (index/reshard.py), snapshot churn
(ops/snapshotdiff.py), Elias codes (index/eliascodes.py)."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.index.eliascodes import elias_audit
from tokenkit_spark.index.reshard import (
    reshard_movement_audit,
    ring_assign,
    ring_points,
)
from tokenkit_spark.ops.snapshotdiff import (
    snapshot_diff,
    synthetic_second_crawl,
)


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(n)], "doc_id long, text string"
    )


# -------------------------------------------------------------- reshard


def test_ring_beats_mod_on_movement(spark):
    out = reshard_movement_audit(
        _docs(spark, 400), n_shards=16, vnodes=8
    ).collect()[0]
    assert out.n_docs == 400
    # mod moves ~15/16 of docs, the ring ~1/17 (vnode variance allowed)
    assert out.frac_mod > 0.8
    assert out.frac_ring < 0.3
    assert out.frac_ring < out.frac_mod
    assert 0 < out.ring_max_share < 0.5


def test_ring_assignment_is_deterministic_and_total(spark):
    d = _docs(spark, 50)
    ring = ring_points(spark, 4, vnodes=8)
    a1 = sorted(map(tuple, ring_assign(d, ring).collect()))
    a2 = sorted(map(tuple, ring_assign(d, ring).collect()))
    assert a1 == a2 and len(a1) == 50
    assert {s for _, s in a1} <= {0, 1, 2, 3}


def test_ring_unchanged_docs_keep_their_shard(spark):
    # Docs not moved by the ring keep the same owner: growing the ring
    # only ever reassigns docs TO the new shard's arcs.
    d = _docs(spark, 200)
    a16 = dict(ring_assign(d, ring_points(spark, 16, 8)).collect())
    a17 = dict(ring_assign(d, ring_points(spark, 17, 8)).collect())
    for doc, s17 in a17.items():
        if s17 != a16[doc]:
            assert s17 == 16  # movement only into the new shard


# ---------------------------------------------------------------- churn


def test_snapshot_diff_classes_hand_case(spark):
    d = _docs(spark, 100)
    out = {r.status: r.n_docs for r in
           snapshot_diff(d, synthetic_second_crawl(d)).collect()}
    # removed: %13==0 -> 8 of 0..99; added: %17==0 -> 6 clones;
    # changed: %7==0 minus those also %13==0 (0 and 91): 15 - 2 = 13
    assert out["removed"] == 8
    assert out["added"] == 6
    assert out["changed"] == 13
    assert out["unchanged"] == 100 - 8 - 13
    total = sum(out.values())
    shares = snapshot_diff(d, synthetic_second_crawl(d)).collect()
    assert sum(r.share for r in shares) == pytest.approx(1.0, abs=1e-5)
    assert total == 106  # union universe: 100 old + 6 added


def test_snapshot_diff_identical_snapshots(spark):
    d = _docs(spark, 20)
    out = snapshot_diff(d, d).collect()
    assert [(r.status, r.n_docs) for r in out] == [("unchanged", 20)]


# ---------------------------------------------------------------- Elias


def _postings(spark, rows):
    return spark.createDataFrame(rows, "term string, doc_id long")


def test_elias_hand_lengths(spark):
    # term t: ids 0, 1, 3 -> +1-shifted gaps: 1, 1, 2.
    # gamma: 1,1,3 = 5 bits; delta: 1,1,4 = 6 bits; varint 24 bits.
    out = elias_audit(_postings(spark, [("t", 0), ("t", 1), ("t", 3)]))
    r = out.collect()[0]
    assert r.gamma_bits == 5 and r.delta_bits == 6 and r.varint_bits == 24


def test_elias_delta_wins_on_large_gaps(spark):
    # Large gaps: delta's log-log prefix beats gamma's unary prefix.
    rows = [("t", i * 100_000) for i in range(1, 50)]
    r = elias_audit(_postings(spark, rows)).collect()[0]
    assert r.delta_bits < r.gamma_bits
