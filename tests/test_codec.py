"""Codec round-trip tests (numpy varint/delta + block-max)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tokenkit_spark.index import codec


def test_varint_roundtrip_small():
    v = np.array([0, 1, 127, 128, 129, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(v), len(v)) == v).all()


def test_varint_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip_random(xs):
    v = np.array(xs, dtype=np.uint64)
    got = codec.varint_decode(codec.varint_encode(v))
    assert got.size == v.size and (got == v).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=300, unique=True
    )
)
def test_posting_roundtrip_signed_docids(ids):
    doc_ids = np.sort(np.array(ids, dtype=np.int64))
    tfs = np.arange(1, doc_ids.size + 1, dtype=np.int64)
    dls = np.full(doc_ids.size, 100, dtype=np.int64)
    enc = codec.encode_posting_list(doc_ids, tfs, dls)
    d, t, l = codec.decode_posting_list(enc)
    assert (d == doc_ids).all() and (t == tfs).all() and (l == dls).all()


def test_block_metadata():
    n = 300
    doc_ids = np.arange(n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    tfs[200] = 50  # spike in block 1 (128..255)
    dls = np.full(n, 100, dtype=np.int64)
    dls[130] = 7  # short doc in block 1
    enc = codec.encode_posting_list(doc_ids, tfs, dls)
    assert len(enc["block_last"]) == 3
    assert enc["block_last"][0] == 127 and enc["block_last"][-1] == n - 1
    assert enc["block_max_tf"] == [1, 50, 1]
    assert enc["block_min_dl"] == [100, 7, 100]
    # the query-time bound dominates every posting's true norm at ANY avgdl
    for avgdl in (10.0, 100.0, 1000.0):
        norms = codec.bm25_norm(tfs, dls, avgdl)
        ub = codec.block_bound(enc["block_max_tf"], enc["block_min_dl"], avgdl)
        for b in range(3):
            s, e = b * codec.BLOCK_SIZE, min((b + 1) * codec.BLOCK_SIZE, n)
            assert ub[b] >= norms[s:e].max() - 1e-12


def test_encode_runs_matches_per_run():
    rng = np.random.default_rng(5)
    # 200 runs of wildly varying length incl. >BLOCK_SIZE and singletons
    lens = np.concatenate([rng.integers(1, 6, 150), rng.integers(100, 400, 50)])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ends = np.cumsum(lens)
    n = int(ends[-1])
    doc_ids = np.empty(n, dtype=np.int64)
    for s, e in zip(starts, ends):
        doc_ids[s:e] = np.sort(rng.choice(10**7, size=e - s, replace=False)) - 5 * 10**6
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(5, 800, size=n).astype(np.int64)
    got = codec.encode_runs(starts, ends, doc_ids, tfs, dls)
    assert len(got) == len(lens)
    for (s, e, g) in zip(starts, ends, got):
        want = codec.encode_posting_list(doc_ids[s:e], tfs[s:e], dls[s:e])
        assert g[0] == want["n_postings"]
        assert g[1] == want["doc_ids_blob"]
        assert g[2] == want["tfs_blob"]
        assert g[3] == want["dls_blob"]
        assert g[4] == want["block_last"]
        assert g[5] == want["block_max_tf"]
        assert g[6] == want["block_min_dl"]
        assert g[7] == want["block_doc_off"]
        assert g[8] == want["block_tf_off"]
        assert g[9] == want["block_dl_off"]
        assert g[10] == int(tfs[s:e].sum())


def test_positions_roundtrip():
    rng = np.random.default_rng(9)
    rows_per_run = rng.integers(1, 8, size=40)
    starts = np.concatenate(([0], np.cumsum(rows_per_run)[:-1]))
    ends = np.cumsum(rows_per_run)
    tfs = rng.integers(1, 6, size=int(ends[-1]))
    pos_lists = [np.sort(rng.choice(1000, size=t, replace=False)) for t in tfs]
    shuffled = [rng.permutation(p) for p in pos_lists]  # encoder must sort
    blobs = codec.encode_positions_runs(starts, ends, tfs, shuffled)
    for r, (s, e) in enumerate(zip(starts, ends)):
        flat, offs = codec.decode_positions(blobs[r], tfs[s:e])
        want = np.concatenate([pos_lists[i] for i in range(s, e)])
        assert (flat == want).all()
        assert (offs == np.concatenate(([0], np.cumsum(tfs[s:e])[:-1]))).all()


def test_delete_kernel_matches_reencode():
    """Pure-Python check: the delete kernel's output rows equal encoding
    the surviving postings from scratch at the post-delete avgdl."""
    import pandas as pd

    from tokenkit_spark.index.build import _encode_rows
    from tokenkit_spark.index.delete import _delete_kernel

    rows = []
    for term, ids in [("alpha", [1, 2, 5, 9]), ("beta", [2, 3]), ("gone", [5, 9])]:
        for d in ids:
            rows.append(
                {"shard": 0, "term_bucket": 0, "term": term, "doc_id": d,
                 "tf": d % 3 + 1, "dl": 40 + d, "positions": list(range(d % 3 + 1))}
            )
    pdf = pd.DataFrame(rows).sort_values(["shard", "term_bucket", "term", "doc_id"])
    segs = _encode_rows(pdf)

    class FakeBC:
        value = np.array([5, 9], dtype=np.int64)

    out = list(_delete_kernel(FakeBC())(iter([segs])))
    got = pd.concat(out, ignore_index=True)

    keep_pdf = pdf[~pdf["doc_id"].isin([5, 9])]
    want = _encode_rows(keep_pdf.reset_index(drop=True))
    assert list(got["term"]) == list(want["term"])  # 'gone' dropped entirely
    for col in got.columns:
        for a, b in zip(got[col], want[col]):
            if isinstance(a, (bytes, bytearray)):
                assert bytes(a) == bytes(b), col
            elif isinstance(a, np.ndarray) or isinstance(a, list):
                assert list(a) == list(b), col
            else:
                assert a == b, col
