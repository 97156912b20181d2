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
    enc = codec.encode_posting_list(doc_ids, tfs, dls, avgdl=90.0)
    d, t, l = codec.decode_posting_list(enc)
    assert (d == doc_ids).all() and (t == tfs).all() and (l == dls).all()


def test_block_max():
    n = 300
    doc_ids = np.arange(n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    tfs[200] = 50  # spike in block 1 (128..255)
    dls = np.full(n, 100, dtype=np.int64)
    enc = codec.encode_posting_list(doc_ids, tfs, dls, avgdl=100.0)
    assert len(enc["block_last"]) == 3
    assert enc["block_last"][0] == 127 and enc["block_last"][-1] == n - 1
    norms = codec.bm25_norm(tfs, dls, 100.0)
    assert np.isclose(enc["block_max"][1], norms[200])
    assert np.isclose(enc["block_max"][0], norms[0])
