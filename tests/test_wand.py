"""Block-Max WAND: lazy block decode + exact-pruning invariants.

The pruned path must return the EXACT same top-k (ids and scores) as
exhaustive accumulation, while decoding strictly fewer blocks on skewed
(Zipf-like) posting lists — the 100-TB head-term case in miniature.
"""

import numpy as np
import pytest

from tokenkit_spark.index import codec, wand

AVGDL = 80.0


def _make_term(doc_ids, tfs, dls, idf):
    enc = codec.encode_posting_list(
        np.asarray(doc_ids, dtype=np.int64),
        np.asarray(tfs, dtype=np.int64),
        np.asarray(dls, dtype=np.int64),
    )
    enc["idf"] = idf
    return enc


def _exhaustive(terms, k):
    all_ids, all_scores = [], []
    for t in terms:
        d, tf, dl = codec.decode_posting_list(t)
        all_ids.append(d)
        all_scores.append(t["idf"] * codec.bm25_norm(tf, dl, AVGDL))
    ids = np.concatenate(all_ids)
    scores = np.concatenate(all_scores)
    uniq, inv = np.unique(ids, return_inverse=True)
    total = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(total, inv, scores)
    sel = np.lexsort((uniq, -total))[:k]
    return uniq[sel], total[sel]


def _zipf_corpus(rng, n_docs=5000):
    """One huge low-idf head term + several selective high-idf terms."""
    head_ids = np.sort(rng.choice(n_docs * 10, size=n_docs, replace=False))
    rare1 = np.sort(rng.choice(head_ids, size=40, replace=False))
    rare2 = np.sort(rng.choice(head_ids, size=25, replace=False))
    dls = lambda n: rng.integers(40, 160, size=n)
    return [
        _make_term(head_ids, rng.integers(1, 4, size=n_docs), dls(n_docs), idf=0.05),
        _make_term(rare1, rng.integers(1, 8, size=40), dls(40), idf=5.2),
        _make_term(rare2, rng.integers(1, 8, size=25), dls(25), idf=6.1),
    ]


def test_decode_block_matches_full():
    rng = np.random.default_rng(7)
    n = 1000
    doc_ids = np.sort(rng.choice(10**9, size=n, replace=False).astype(np.int64))
    # include negative ids (xxhash64 doc ids are signed)
    doc_ids[: n // 2] -= 2**62
    doc_ids = np.sort(doc_ids)
    tfs = rng.integers(1, 30, size=n)
    dls = rng.integers(10, 500, size=n)
    t = _make_term(doc_ids, tfs, dls, idf=1.0)
    full = codec.decode_posting_list(t)
    nblocks = len(t["block_last"])
    assert nblocks == (n + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    for b in range(nblocks):
        d, tf, dl = codec.decode_block(
            t["doc_ids_blob"], t["tfs_blob"], t["dls_blob"], n,
            t["block_doc_off"], t["block_tf_off"], t["block_dl_off"],
            t["block_last"], b,
        )
        s, e = b * codec.BLOCK_SIZE, min((b + 1) * codec.BLOCK_SIZE, n)
        assert (d == full[0][s:e]).all()
        assert (tf == full[1][s:e]).all()
        assert (dl == full[2][s:e]).all()


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("k", [5, 10, 50])
def test_wand_exact_topk(seed, k):
    rng = np.random.default_rng(seed)
    terms = _zipf_corpus(rng)
    want_ids, want_scores = _exhaustive(terms, k)
    got = wand.score_query_shard(terms, AVGDL, k)
    assert (got["doc_ids"] == want_ids).all()
    assert np.allclose(got["scores"], want_scores)


def test_wand_prunes_head_term_blocks():
    rng = np.random.default_rng(11)
    terms = _zipf_corpus(rng, n_docs=20000)
    got = wand.score_query_shard(terms, AVGDL, k=10)
    # the rare terms raise θ above partial+head_ub for most head blocks
    assert got["blocks_decoded"] < got["blocks_total"]
    skipped = got["blocks_total"] - got["blocks_decoded"]
    assert skipped > got["blocks_total"] * 0.3, (got["blocks_decoded"], got["blocks_total"])


def test_wand_single_term_and_empty():
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(10**6, size=500, replace=False))
    t = _make_term(ids, rng.integers(1, 5, size=500), rng.integers(20, 200, size=500), idf=2.0)
    got = wand.score_query_shard([t], AVGDL, k=10)
    want_ids, want_scores = _exhaustive([t], 10)
    assert (got["doc_ids"] == want_ids).all() and np.allclose(got["scores"], want_scores)
    empty = wand.score_query_shard([], AVGDL, k=10)
    assert empty["doc_ids"].size == 0


def test_wand_exact_across_avgdl_shift():
    """Regression (ADVICE r01): segments encoded while the corpus avgdl
    was small must stay exactly prunable when the same lists are queried
    at a much larger avgdl (resume/merge/delete shift avgdl). The block
    metadata is avgdl-independent, so BOTH directions must be exact."""
    rng = np.random.default_rng(42)
    terms = _zipf_corpus(rng)

    def exhaustive_at(avgdl, k):
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
        sel = np.lexsort((uniq, -total))[:k]
        return uniq[sel], total[sel]

    for avgdl in (30.0, 300.0, 30.0):  # same term dicts across shifts
        want_ids, want_scores = exhaustive_at(avgdl, 10)
        got = wand.score_query_shard(terms, avgdl, 10)
        assert (got["doc_ids"] == want_ids).all(), avgdl
        assert np.allclose(got["scores"], want_scores), avgdl


@pytest.mark.parametrize("seed", list(range(6)))
def test_wand_random_overlap_fuzz(seed):
    """Heavily overlapping mid-size lists: every doc near the threshold."""
    rng = np.random.default_rng(100 + seed)
    pool = np.sort(rng.choice(4000, size=1500, replace=False).astype(np.int64))
    terms = []
    for _ in range(rng.integers(2, 6)):
        n = int(rng.integers(50, 1200))
        ids = np.sort(rng.choice(pool, size=n, replace=False))
        terms.append(
            _make_term(ids, rng.integers(1, 10, size=n), rng.integers(10, 300, size=n),
                       idf=float(rng.uniform(0.1, 6.0)))
        )
    k = int(rng.integers(1, 40))
    want_ids, want_scores = _exhaustive(terms, k)
    got = wand.score_query_shard(terms, AVGDL, k)
    assert (got["doc_ids"] == want_ids).all()
    assert np.allclose(got["scores"], want_scores)


def _exhaustive_filtered(terms, k, eligible):
    ids, scores = _exhaustive(terms, 10**9)
    m = np.isin(ids, eligible)
    ids, scores = ids[m], scores[m]
    sel = np.lexsort((ids, -scores))[:k]
    return ids[sel], scores[sel]


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("frac", [0.0, 0.05, 0.5, 1.0])
def test_wand_filtered_exact(seed, frac):
    """Filtered search (eligible doc-id set): both kernels must return
    the exact filtered top-k — the filter applies BEFORE the local cut,
    and pruning with an eligible-only θ must stay safe."""
    rng = np.random.default_rng(seed)
    terms = _zipf_corpus(rng)
    universe = np.unique(np.concatenate([codec.decode_posting_list(t)[0] for t in terms]))
    n_el = int(round(frac * universe.size))
    eligible = np.sort(rng.choice(universe, size=n_el, replace=False))
    # mix in ids that match nothing (filter sets are arbitrary relations)
    eligible = np.unique(np.concatenate([eligible, np.array([-1, 10**15], dtype=np.int64)]))
    for kernel in (wand.score_query_shard, wand.score_query_direct):
        for k in (5, 10, 50):
            want_ids, want_scores = _exhaustive_filtered(terms, k, eligible)
            got = kernel(terms, AVGDL, k, eligible=eligible)
            assert (got["doc_ids"] == want_ids).all(), (kernel.__name__, k)
            assert np.allclose(got["scores"], want_scores), (kernel.__name__, k)


def test_wand_filtered_empty_eligible():
    rng = np.random.default_rng(9)
    terms = _zipf_corpus(rng)
    for kernel in (wand.score_query_shard, wand.score_query_direct):
        got = kernel(terms, AVGDL, 10, eligible=np.zeros(0, dtype=np.int64))
        assert got["doc_ids"].size == 0
