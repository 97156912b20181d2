"""Borda fusion, LRU stack-distance audit, and binary-quantization
recall on hand-computed cases."""

from tokenkit_spark.index.cache import lru_stack_audit
from tokenkit_spark.index.hybrid import borda_fuse
from tokenkit_spark.ops.similarity import binary_hamming_recall


def test_borda_fuse_leftover_points_rule(spark):
    # voter A ranks [1, 2]; voter B ranks [2, 3]. union n = 3.
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id long, rank long, doc_id long"
    )
    b = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 3)], "query_id long, rank long, doc_id long"
    )
    rows = borda_fuse([a, b], k=10).collect()
    got = {r.doc_id: r.borda for r in rows}
    # A: doc1=3, doc2=2, doc3 unranked -> (3-2+1)/2 = 1
    # B: doc2=3, doc3=2, doc1 unranked -> 1
    assert got == {1: 4.0, 2: 5.0, 3: 3.0}
    ranks = {r.doc_id: r.rank for r in rows}
    assert ranks == {2: 1, 1: 2, 3: 3}


def test_lru_stack_audit_hand_trace(spark):
    # trace: a b a c b a  (one doc, positions in order)
    docs = spark.createDataFrame(
        [(1, "a b a c b a")], "doc_id long, text string"
    )
    out = {
        r.cache_size: r
        for r in lru_stack_audit(docs, sizes=(1, 2, 3), window=16).collect()
    }
    # accesses: 6; first refs: a@1, b@2, c@4 -> 3
    # gaps: a(1,3) dist=1+1=2; b(2,5) dist=1+2=3; a(3,6) dist=1+2=3
    assert out[1].n_accesses == 6 and out[1].first_refs == 3
    assert out[1].unresolved == 0
    assert out[1].hits == 0
    assert out[2].hits == 1       # only a(1,3) fits C=2
    assert out[3].hits == 3
    assert abs(out[3].hit_rate - 0.5) < 1e-9


def test_lru_stack_audit_unresolved_window(spark):
    # gap raw length 4 > window 2 -> unresolved, miss everywhere
    docs = spark.createDataFrame(
        [(1, "a b c d e a")], "doc_id long, text string"
    )
    out = {
        r.cache_size: r
        for r in lru_stack_audit(docs, sizes=(8,), window=2).collect()
    }
    assert out[8].unresolved == 1 and out[8].hits == 0


def test_binary_hamming_recall_identity_and_break(spark):
    # 4-dim: vecs 0/1 share all sign bits AND are cosine-nearest;
    # vec 2 differs in signs. recall@1 for query 0 must be 1.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 2.0, -1.0, 0.5]),
            (1, [0.9, 1.8, -1.2, 0.4]),
            (2, [-1.0, -2.0, 1.0, -0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = binary_hamming_recall(emb, query_ids=[0], k=1).collect()
    assert rows[0].recall_at_k == 1.0
