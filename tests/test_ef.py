"""Elias-Fano doc-id codec (index/ef.py): roundtrip, size bound,
hypothesis fuzz, and the varint comparison invariants."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tokenkit_spark.index.codec import delta_encode, varint_encode
from tokenkit_spark.index.ef import ef_decode, ef_encode, ef_size_bytes


@pytest.mark.parametrize(
    "n,u",
    [(1, 2), (1, 10), (5, 100), (128, 128), (1000, 10_000), (1000, 10_000_000)],
)
def test_roundtrip(n, u):
    rng = np.random.default_rng(n * 31 + u)
    ids = np.sort(rng.choice(u, size=n, replace=False).astype(np.uint64))
    enc = ef_encode(ids, u)
    assert (ef_decode(enc) == ids).all()
    assert len(enc["low_blob"]) + len(enc["high_blob"]) == ef_size_bytes(n, u)


def test_empty():
    enc = ef_encode(np.array([], dtype=np.uint64))
    assert ef_decode(enc).size == 0


def test_default_universe_and_validation():
    ids = np.array([3, 9, 12], dtype=np.uint64)
    assert (ef_decode(ef_encode(ids)) == ids).all()
    with pytest.raises(ValueError):
        ef_encode(np.array([5, 2], dtype=np.uint64))
    with pytest.raises(ValueError):
        ef_encode(ids, universe=12)  # must exceed max


def test_duplicates_allowed():
    # EF encodes monotone (non-strict) sequences; posting lists are
    # strict, but the codec itself must tolerate ties
    ids = np.array([4, 4, 4, 9, 9], dtype=np.uint64)
    assert (ef_decode(ef_encode(ids, 16)) == ids).all()


def test_size_bound_theoretical():
    # n*(2 + ceil(log2(u/n))) bits + O(1): Vigna 2013's bound
    rng = np.random.default_rng(0)
    n, u = 10_000, 1_000_000
    ids = np.sort(rng.choice(u, size=n, replace=False).astype(np.uint64))
    enc = ef_encode(ids, u)
    bits = (len(enc["low_blob"]) + len(enc["high_blob"])) * 8
    bound = n * (2 + int(np.ceil(np.log2(u / n)))) + 16
    assert bits <= bound


def test_dense_beats_varint():
    # dense lists: every gap costs varint a full byte; EF ~2-3 bits
    ids = np.arange(0, 100_000, 2, dtype=np.uint64)
    enc = ef_encode(ids, 100_000)
    eb = len(enc["low_blob"]) + len(enc["high_blob"])
    vb = len(varint_encode(delta_encode(ids)))
    assert eb * 2 < vb


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500)
)
def test_fuzz_roundtrip(vals):
    ids = np.sort(np.asarray(vals, dtype=np.uint64))
    enc = ef_encode(ids)
    assert (ef_decode(enc) == ids).all()
