"""Filtered kNN, binary-quantization Hamming ANN, and MMR rerank
(ops/similarity.py round-3 additions).

Reference contracts: ES/Lucene `knn` with `filter` (pre-filter
semantics); Lucene-style 1-bit scalar quantization + Hamming candidate
scan with exact re-rank; Carbonell & Goldstein 1998 MMR.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops import similarity as sim


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=64)], int(i % 3))
        for i in range(80)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


def test_filtered_topk_prefilters(spark, emb):
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    out = sim.filtered_cosine_topk(emb, F.col("label") == 1, q, k=5).collect()
    assert len(out) == 5
    ok = {r.vec_id for r in emb.filter("label = 1").collect()}
    assert all(r.vec_id in ok for r in out)
    # pre-filter semantics: k survivors even when global top-k is off-filter
    scores = [r.cosine for r in out]
    assert scores == sorted(scores, reverse=True)


def test_binary_quantize_signs(spark):
    v = [1.0, -1.0, 0.0, 2.0] + [0.0] * 60  # bits 0 and 3 set in word 0
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<float>")
    sig = sim.binary_quantize(df, dim=64).first()["sig"]
    assert len(sig) == 2
    assert sig[0] == (1 << 0) + (1 << 3)
    assert sig[1] == 0


def test_hamming_matches_numpy(spark, emb):
    sigs = {r.vec_id: r.sig for r in sim.binary_quantize(emb, dim=64).collect()}
    vecs = {r.vec_id: np.asarray(r.embedding) for r in emb.collect()}
    for a, b in [(0, 1), (2, 3), (10, 40)]:
        want = int(np.sum((vecs[a] > 0) != (vecs[b] > 0)))
        got = sum(
            bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1")
            for sa, sb in zip(sigs[a], sigs[b])
        )
        assert got == want


def test_binary_hamming_topk_recall(spark, emb):
    exact = [
        r.vec_id
        for r in sim.cosine_topk(
            emb, [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]], k=10
        ).collect()
    ]
    got = sim.binary_hamming_topk(emb, query_id=0, k=10, dim=64, shortlist=40).collect()
    assert len(got) == 10
    assert got[0].vec_id == 0 and got[0].hamming == 0
    # sign sketches on gaussian vectors: expect solid-but-not-perfect recall
    recall = len(set(exact) & {r.vec_id for r in got}) / 10
    assert recall >= 0.5
    # exact re-rank: cosines are true fp cosines, descending
    cs = [r.cosine for r in got]
    assert cs == sorted(cs, reverse=True)
    assert math.isclose(cs[0], 1.0, abs_tol=1e-6)


def _mmr_numpy(ids, rel, unit, k, lam):
    pair = unit @ unit.T
    selected, scores = [], []
    remaining = list(np.lexsort((ids, -rel)))
    while remaining and len(selected) < k:
        best_i, best_s = None, -np.inf
        for i in remaining:
            div = pair[i, selected].max() if selected else 0.0
            s = lam * rel[i] - (1 - lam) * div
            if s > best_s + 1e-12 or (
                best_i is not None and abs(s - best_s) <= 1e-12 and ids[i] < ids[best_i]
            ):
                best_i, best_s = i, s
        selected.append(best_i)
        scores.append(best_s)
        remaining.remove(best_i)
    return [int(ids[i]) for i in selected], scores


def test_mmr_parity_and_diversity(spark, emb):
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    out = sim.mmr_rerank(emb, q, k=8, lam=0.5, pool=30).collect()
    assert [r.rank for r in out] == list(range(1, 9))

    # independent numpy replay over the same candidate pool
    cand = (
        sim.cosine_scores(emb, q)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(30)
        .collect()
    )
    ids = np.array([r.vec_id for r in cand])
    rel = np.array([r.cosine for r in cand])
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in cand])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    want_ids, want_scores = _mmr_numpy(ids, rel, unit, 8, 0.5)
    assert [r.vec_id for r in out] == want_ids
    for r, s in zip(out, want_scores):
        assert abs(r.mmr_score - s) < 1e-9
    # rank 1 is pure relevance; lam=1 degenerates to plain cosine order
    assert out[0].vec_id == 0
    plain = sim.mmr_rerank(emb, q, k=8, lam=1.0, pool=30).collect()
    exact = sim.cosine_topk(emb, q, k=8).collect()
    assert [r.vec_id for r in plain] == [r.vec_id for r in exact]
