"""Block-Max MAXSCORE: exact-pruning invariants (maxscore.py).

The MAXSCORE path must return the EXACT same top-k (ids and scores) as
exhaustive accumulation, while decoding strictly fewer blocks on skewed
posting lists and actually entering candidate-only (non-essential)
mode on the Zipf shape — the property that distinguishes it from WAND.
"""

import numpy as np
import pytest

from tokenkit_spark.index import codec, wand
from tokenkit_spark.index.maxscore import score_query_maxscore

from test_wand import AVGDL, _exhaustive, _make_term, _zipf_corpus


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("k", [5, 10, 50])
def test_maxscore_exact_topk(seed, k):
    rng = np.random.default_rng(seed)
    terms = _zipf_corpus(rng)
    want_ids, want_scores = _exhaustive(terms, k)
    got = score_query_maxscore(terms, AVGDL, k)
    assert (got["doc_ids"] == want_ids).all()
    assert np.allclose(got["scores"], want_scores)


def test_maxscore_prunes_and_demotes_head_term():
    """On the Zipf corpus the rare high-idf terms process first (highest
    ub), θ rises above the head term's ub + 0 remaining, so the head
    list becomes NON-essential: candidate-only blocks, most skipped."""
    rng = np.random.default_rng(11)
    terms = _zipf_corpus(rng, n_docs=20000)
    got = score_query_maxscore(terms, AVGDL, k=10)
    assert got["blocks_decoded"] < got["blocks_total"]
    assert got["nonessential_terms"] >= 1, got
    skipped = got["blocks_total"] - got["blocks_decoded"]
    assert skipped > got["blocks_total"] * 0.3, (
        got["blocks_decoded"], got["blocks_total"],
    )


def test_maxscore_single_term_and_empty():
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(10**6, size=500, replace=False))
    t = _make_term(
        ids, rng.integers(1, 5, size=500), rng.integers(20, 200, size=500), idf=2.0
    )
    got = score_query_maxscore([t], AVGDL, k=10)
    want_ids, want_scores = _exhaustive([t], 10)
    assert (got["doc_ids"] == want_ids).all()
    assert np.allclose(got["scores"], want_scores)
    empty = score_query_maxscore([], AVGDL, k=10)
    assert empty["doc_ids"].size == 0


@pytest.mark.parametrize("seed", list(range(8)))
def test_maxscore_random_overlap_fuzz(seed):
    """Heavily overlapping mid-size lists + parity with the WAND kernel
    on the same shared term dicts (both memoize onto them)."""
    rng = np.random.default_rng(200 + seed)
    pool = np.sort(rng.choice(4000, size=1500, replace=False).astype(np.int64))
    terms = []
    for _ in range(rng.integers(2, 7)):
        n = int(rng.integers(50, 1200))
        ids = np.sort(rng.choice(pool, size=n, replace=False))
        terms.append(
            _make_term(
                ids,
                rng.integers(1, 10, size=n),
                rng.integers(10, 300, size=n),
                idf=float(rng.uniform(0.1, 6.0)),
            )
        )
    k = int(rng.integers(1, 40))
    want_ids, want_scores = _exhaustive(terms, k)
    got = score_query_maxscore(terms, AVGDL, k)
    assert (got["doc_ids"] == want_ids).all()
    assert np.allclose(got["scores"], want_scores)
    via_wand = wand.score_query_shard(terms, AVGDL, k)
    assert (got["doc_ids"] == via_wand["doc_ids"]).all()


def test_maxscore_exact_across_avgdl_shift():
    """Same avgdl-shift safety contract as WAND: block metadata is
    avgdl-independent, bounds recompute per queried avgdl."""
    rng = np.random.default_rng(42)
    terms = _zipf_corpus(rng)
    for avgdl in (30.0, 300.0, 30.0):
        all_ids, all_scores = [], []
        for t in terms:
            d, tf, dl = codec.decode_posting_list(t)
            all_ids.append(d)
            all_scores.append(t["idf"] * codec.bm25_norm(tf, dl, avgdl))
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        total = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(total, inv, scores)
        sel = np.lexsort((uniq, -total))[:10]
        got = score_query_maxscore(terms, avgdl, 10)
        assert (got["doc_ids"] == uniq[sel]).all(), avgdl
        assert np.allclose(got["scores"], total[sel]), avgdl
