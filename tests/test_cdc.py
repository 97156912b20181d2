"""Content-defined chunking (ops/cdc.py): sequential-reference parity,
the insertion-resilience property CDC exists for, clamps, and
partitioning invariance."""

import hashlib

import numpy as np
import pytest

from tokenkit_spark.ops.cdc import (
    _GEAR,
    cdc_boundaries,
    cdc_chunk_table,
    cdc_dedup_stats,
    gear_hashes,
)


def _seq_gear(data: bytes) -> np.ndarray:
    h = np.uint64(0)
    out = np.empty(len(data), dtype=np.uint64)
    for i, b in enumerate(data):
        h = np.uint64((int(h) << 1) + int(_GEAR[b]) & (2**64 - 1))
        out[i] = h
    return out


def test_gear_hash_matches_sequential_reference():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 500, dtype=np.uint8).tobytes()
    got = gear_hashes(data)
    want = _seq_gear(data)
    # positions >= 64 match exactly (before that the sequential form
    # still carries bytes the 64-term expansion has shifted out... no:
    # (h<<1) drops bit 63 each step, so they agree everywhere)
    assert (got == want).all()


def test_insertion_only_rechunks_neighborhood():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    mutated = data[:10_000] + b"INSERTED!" + data[10_000:]

    def chunk_hashes(d):
        out, s = [], 0
        for e in cdc_boundaries(d):
            out.append(hashlib.md5(d[s:e]).hexdigest())
            s = e
        return out

    a, b = set(chunk_hashes(data)), set(chunk_hashes(mutated))
    # the vast majority of chunks survive the insertion
    assert len(a & b) / len(a) > 0.8


def test_clamps():
    data = bytes(50_000)  # constant bytes: mask may never/always hit
    ends = cdc_boundaries(data, min_size=64, max_size=4096)
    sizes = np.diff([0] + ends)
    assert ends[-1] == len(data)
    assert sizes.max() <= 4096
    assert all(s >= 64 or e == len(data) for s, e in zip(sizes, ends))


def test_spark_inventory_and_partitioning_invariance(spark):
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    rows = [
        (0, bytearray(base)),
        (1, bytearray(base[:3000] + b"xyz" + base[3000:])),  # near-dup
        (2, bytearray(rng.integers(0, 256, 6000, dtype=np.uint8).tobytes())),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    kw = dict(avg_bits=7, min_size=32, max_size=512)  # ~128B chunks
    inv1 = sorted(
        map(tuple, cdc_chunk_table(docs.repartition(1), **kw).collect())
    )
    inv7 = sorted(
        map(tuple, cdc_chunk_table(docs.repartition(7), **kw).collect())
    )
    assert inv1 == inv7 and len(inv1) > 30
    stats = cdc_dedup_stats(cdc_chunk_table(docs, **kw)).collect()[0]
    assert stats.dedup_ratio > 1.4  # docs 0/1 share most chunks
    assert stats.total_bytes > stats.unique_bytes
