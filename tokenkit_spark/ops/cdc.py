"""Content-defined chunking (CDC) for binary payload dedup.

Fixed-size chunking breaks under insertion: one byte shifts every later
chunk boundary and kills dedup. CDC (Muthitacharoen et al., "A Low-
Bandwidth Network File System", SOSP 2001; gear-hash variant per Xia et
al., "FastCDC", USENIX ATC 2016) places boundaries where a rolling hash
of the trailing bytes hits a mask — boundaries move WITH the content,
so an insertion only re-chunks its neighborhood and identical regions
across documents/snapshots hash to identical chunks.

Gear rolling hash: ``h_i = (h_{i-1} << 1) + gear[b_i]  (mod 2^64)``
— expanding the recurrence, ``h_i = Σ_{j=0..63} gear[b_{i-j}] << j``:
bytes older than 64 positions have shifted out, so it IS a 64-byte
window hash computable WITHOUT the sequential loop: 64 shifted
whole-array adds over the gear-mapped byte array (numpy, uint64 wrap).
A boundary falls where ``h & mask == 0`` (mask with ``avg_bits`` ones
-> expected chunk ≈ 2^avg_bits bytes), subject to min/max chunk-size
clamps applied greedily over the (sparse) candidate set.

Spark shape: chunking runs inside ``mapInPandas`` over the binary
column — embarrassingly parallel, no shuffle; the cross-corpus chunk
dedup afterward is one hash aggregate on the chunk digest. The
boundaries depend only on bytes, never on partitioning, so the chunk
inventory is cluster-size-independent (asserted in tests).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GEAR = np.random.default_rng(31).integers(
    0, 1 << 63, size=256, dtype=np.int64
).astype(np.uint64)


def gear_hashes(data: bytes) -> np.ndarray:
    """Per-position 64-byte-window gear hash of ``data`` (uint64)."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    n = b.size
    h = np.zeros(n, dtype=np.uint64)
    for j in range(min(64, n)):
        h[j:] += g[: n - j] << np.uint64(j)
    return h


def cdc_boundaries(
    data: bytes,
    avg_bits: int = 10,
    min_size: int = 64,
    max_size: int = 4096,
) -> list[int]:
    """Chunk END offsets (exclusive) for ``data``: mask hits with
    greedy min/max clamps; always ends with len(data)."""
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64((1 << avg_bits) - 1)
    h = gear_hashes(data)
    candidates = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER the hit
    ends = []
    start = 0
    for c in candidates:
        if c - start < min_size:
            continue
        while c - start > max_size:  # force cuts for long gaps
            start += max_size
            ends.append(start)
        ends.append(int(c))
        start = int(c)
    while n - start > max_size:
        start += max_size
        ends.append(start)
    if start < n:
        ends.append(n)
    return ends


def cdc_chunk_table(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    avg_bits: int = 10,
    min_size: int = 64,
    max_size: int = 4096,
) -> DataFrame:
    """(doc_id, chunk_idx, offset, length, chunk_hash): the CDC chunk
    inventory of a binary column. Arrow-batched mapInPandas; md5 chunk
    digests so downstream dedup joins are engine-portable."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                data = bytes(payload)
                start = 0
                for i, end in enumerate(
                    cdc_boundaries(data, avg_bits, min_size, max_size)
                ):
                    rows.append(
                        (
                            did,
                            i,
                            start,
                            end - start,
                            hashlib.md5(data[start:end]).hexdigest(),
                        )
                    )
                    start = end
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_idx", "offset", "length", "chunk_hash"],
            )

    return docs.select(id_col, payload_col).mapInPandas(
        gen,
        f"{id_col} long, chunk_idx int, offset long, length long, "
        "chunk_hash string",
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row storage-dedup summary over a chunk inventory: total vs
    distinct chunk bytes and the dedup ratio."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("refs"), F.min("length").alias("length")
    )
    return per_hash.agg(
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum(F.col("refs") * F.col("length")).alias("total_bytes"),
        F.sum("length").alias("unique_bytes"),
        F.round(
            F.sum(F.col("refs") * F.col("length")) / F.sum("length"), 4
        ).alias("dedup_ratio"),
    )
