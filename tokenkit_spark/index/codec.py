"""Posting-list codec: delta + LEB128 varint, numpy-vectorized, plus
block-max metadata.

The north rule mandates "delta-encoded, varint-compressed docID gaps"
with block-max metadata for WAND pruning. Everything here operates on
whole numpy arrays (no per-int Python), so the segment writer can run
inside Arrow UDFs at full speed.

Layout per posting list (one term within one doc-shard):
  doc_ids : sorted int64 -> gaps (first absolute) -> varint bytes
  tfs     : int64 -> varint bytes
  dls     : per-posting doc length -> varint bytes (needed for exact BM25)
  blocks  : every BLOCK_SIZE postings -> (last_doc_id, max_tf, min_dl).
            The WAND block bound is computed at QUERY time as
            idf * norm(max_tf, min_dl, current_avgdl): the BM25 norm
            tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) is increasing in tf and
            decreasing in dl, so norm(max_tf, min_dl) >= norm(tf_i, dl_i)
            for every posting i in the block — a safe upper bound under
            ANY avgdl. Storing (max_tf, min_dl) instead of a precomputed
            norm makes segments avgdl-independent: resumed builds, merges
            and deletes that shift the corpus avgdl can never leave a
            stale (unsafe) block bound behind.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
K1 = 1.2
B = 0.75


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64/uint64 array, vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # fill byte position j of each value (j < nbytes[i]) without per-value loops:
    # iterate over byte-index (max 10 iterations for 64-bit), vectorized inside
    maxb = int(nbytes.max())
    shifted = v.copy()
    for j in range(maxb):
        active = nbytes > j
        idx = starts[active] + j
        byte = (shifted[active] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[active] > (j + 1)).astype(np.uint8) << 7
        out[idx] = byte | cont
        shifted = shifted >> np.uint64(7)
    return out.tobytes()


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Byte length of each value's LEB128 encoding (for block offsets)."""
    v = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    return np.maximum(nbits // 7, 1)


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array, vectorized."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    maxb = int(lengths.max())
    payload = (raw & 0x7F).astype(np.uint64)
    for j in range(maxb):
        active = lengths > j
        values[active] |= payload[starts[active] + j] << np.uint64(7 * j)
    if count is not None and n != count:
        raise ValueError(f"varint_decode: expected {count} values, got {n}")
    return values


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Sorted absolute ids -> gaps (first value absolute)."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 (possibly negative, e.g. raw doc_ids from xxhash64) -> uint64."""
    v = np.asarray(values, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values, dtype=np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -((v & np.uint64(1)).astype(np.int64))


def bm25_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """Per-posting norm: tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) (float64).
    Final score = idf(term) * norm."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def block_bound(block_max_tf, block_min_dl, avgdl: float) -> np.ndarray:
    """Safe per-block norm upper bound at the CURRENT avgdl (see module
    doc: norm is increasing in tf, decreasing in dl)."""
    return bm25_norm(
        np.asarray(block_max_tf, dtype=np.int64),
        np.asarray(block_min_dl, dtype=np.int64),
        avgdl,
    )


def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> dict:
    """Encode one (shard, term) posting run. doc_ids must be sorted asc."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs_i = np.asarray(tfs, dtype=np.int64)
    dls_i = np.asarray(dls, dtype=np.int64)
    n = doc_ids.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_starts = np.arange(0, n, BLOCK_SIZE)
    block_last = doc_ids[np.minimum(np.arange(1, nblocks + 1) * BLOCK_SIZE, n) - 1]
    block_max_tf = np.maximum.reduceat(tfs_i, block_starts)
    block_min_dl = np.minimum.reduceat(dls_i, block_starts)

    # Byte offset of each block's first varint inside each blob, so a WAND
    # cursor can decode ONE block at a time without scanning the rest. A
    # pruned block is never decoded at all.
    def _offs(sizes: np.ndarray) -> np.ndarray:
        o = np.zeros(nblocks, dtype=np.int64)
        if nblocks > 1:
            o[1:] = np.cumsum(sizes)[block_starts[1:] - 1]
        return o

    return {
        "n_postings": n,
        "block_doc_off": _offs(varint_sizes(delta_encode(doc_ids.view(np.uint64)))).tolist(),
        "block_tf_off": _offs(varint_sizes(np.asarray(tfs, dtype=np.uint64))).tolist(),
        "block_dl_off": _offs(varint_sizes(np.asarray(dls, dtype=np.uint64))).tolist(),
        # signed doc_ids viewed as uint64: mod-2^64 delta/cumsum round-trips
        # exactly even across the sign boundary (first gap is absolute)
        "doc_ids_blob": varint_encode(delta_encode(doc_ids.view(np.uint64))),
        "tfs_blob": varint_encode(np.asarray(tfs, dtype=np.uint64)),
        "dls_blob": varint_encode(np.asarray(dls, dtype=np.uint64)),
        "block_last": block_last.tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "block_min_dl": block_min_dl.tolist(),
    }


def encode_positions_runs(
    starts: np.ndarray,
    ends: np.ndarray,
    tfs: np.ndarray,
    pos_lists,
) -> list[bytes]:
    """Per-run position blobs (north_star: postings carry (docID, tf,
    positions)). ``pos_lists`` is the per-posting position arrays in row
    order (ragged). Layout: positions sorted within each posting,
    delta-encoded per posting (first absolute), varint — one blob per
    (shard, term) run, sliceable back with the run's tf sequence.

    One vectorized pass over the flattened partition; per-run work is a
    byte-slice, mirroring encode_runs.
    """
    nruns = starts.size
    if nruns == 0:
        return []
    lens = np.fromiter((len(p) for p in pos_lists), dtype=np.int64, count=len(pos_lists))
    if not (lens == np.asarray(tfs, dtype=np.int64)).all():
        raise ValueError("positions length must equal tf per posting")
    flat = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_lists])
        if len(pos_lists)
        else np.zeros(0, dtype=np.int64)
    )
    n = flat.size
    if n == 0:
        return [b""] * nruns
    posting_id = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    order = np.lexsort((flat, posting_id))  # sort positions within posting
    flat = flat[order].view(np.uint64)
    p_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gaps = flat.copy()
    gaps[1:] -= flat[:-1]
    nz = p_starts[lens > 0]
    gaps[nz] = flat[nz]  # first position of each posting is absolute
    sizes = varint_sizes(gaps)
    blob = varint_encode(gaps)
    byte_cum = np.concatenate(([0], np.cumsum(sizes)))
    # run r covers rows [starts[r], ends[r]) -> flat range via p_starts
    flat_cum = np.concatenate((p_starts, [n]))
    mv = memoryview(blob)
    out = []
    for r in range(nruns):
        a = flat_cum[starts[r]]
        b = flat_cum[ends[r]]
        out.append(bytes(mv[byte_cum[a] : byte_cum[b]]))
    return out


def decode_positions(blob: bytes, tfs_run: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of one run's position blob: returns (flat positions,
    posting start offsets into it). Posting i's positions are
    ``flat[offs[i]:offs[i] + tfs_run[i]]``, ascending."""
    tfs_run = np.asarray(tfs_run, dtype=np.int64)
    total = int(tfs_run.sum())
    offs = np.concatenate(([0], np.cumsum(tfs_run)[:-1]))
    if total == 0:
        return np.zeros(0, dtype=np.int64), offs
    gaps = varint_decode(blob, total)
    pos = np.cumsum(gaps.astype(np.int64))
    nz = offs[tfs_run > 0]
    # subtract each posting's preceding cumsum so the per-posting
    # sequence restarts at its absolute first position
    base = np.zeros(tfs_run.size, dtype=np.int64)
    base[tfs_run > 0] = np.where(nz > 0, pos[nz - 1], 0)
    pos -= np.repeat(base, tfs_run)
    return pos, offs


def encode_runs(
    starts: np.ndarray,
    ends: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
) -> list[tuple]:
    """Vectorized multi-run encoder: encode EVERY (shard, term) run of a
    sorted partition in one pass. Blob-identical to calling
    ``encode_posting_list`` per run, but the varint/delta/block math runs
    once over the whole partition's arrays — per-run Python work is just
    slicing. (With web-scale vocabularies most runs hold a handful of
    postings; per-run numpy calls would dominate the build.)

    Returns per run: (n_postings, doc_blob, tf_blob, dl_blob, block_last,
    block_max_tf, block_min_dl, block_doc_off, block_tf_off, block_dl_off,
    cf).
    """
    n = doc_ids.size
    nruns = starts.size
    if n == 0:
        return []
    u = np.asarray(doc_ids, dtype=np.int64).view(np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    dls = np.asarray(dls, dtype=np.uint64)

    gaps = u.copy()
    gaps[1:] -= u[:-1]
    gaps[starts] = u[starts]  # first doc of each run is absolute

    gap_sizes = varint_sizes(gaps)
    tf_sizes = varint_sizes(tfs)
    dl_sizes = varint_sizes(dls)
    gap_blob = varint_encode(gaps)
    tf_blob = varint_encode(tfs)
    dl_blob = varint_encode(dls)
    gap_cum = np.concatenate(([0], np.cumsum(gap_sizes)))
    tf_cum = np.concatenate(([0], np.cumsum(tf_sizes)))
    dl_cum = np.concatenate(([0], np.cumsum(dl_sizes)))

    cfs = np.add.reduceat(tfs.astype(np.int64), starts)

    # global block starts: every BLOCK_SIZE-th posting within each run
    lengths = ends - starts
    within = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)
    bstarts = np.flatnonzero(within % BLOCK_SIZE == 0)
    bends = np.append(bstarts[1:], n)  # run starts are block starts, so
    # each block ends at the next block start (== next run start at a
    # run boundary) — never crosses a run
    block_run = np.searchsorted(starts, bstarts, side="right") - 1
    block_max_tf_all = np.maximum.reduceat(tfs.astype(np.int64), bstarts)
    block_min_dl_all = np.minimum.reduceat(dls.astype(np.int64), bstarts)
    block_last_all = np.asarray(doc_ids, dtype=np.int64)[bends - 1]
    bd_off = gap_cum[bstarts] - gap_cum[starts[block_run]]
    bt_off = tf_cum[bstarts] - tf_cum[starts[block_run]]
    bl_off = dl_cum[bstarts] - dl_cum[starts[block_run]]
    # first block index of each run
    bpos = np.searchsorted(block_run, np.arange(nruns + 1))

    mg, mt, ml = memoryview(gap_blob), memoryview(tf_blob), memoryview(dl_blob)
    out = []
    for r in range(nruns):
        s, e = int(starts[r]), int(ends[r])
        b0, b1 = int(bpos[r]), int(bpos[r + 1])
        out.append(
            (
                e - s,
                bytes(mg[gap_cum[s] : gap_cum[e]]),
                bytes(mt[tf_cum[s] : tf_cum[e]]),
                bytes(ml[dl_cum[s] : dl_cum[e]]),
                block_last_all[b0:b1].tolist(),
                block_max_tf_all[b0:b1].tolist(),
                block_min_dl_all[b0:b1].tolist(),
                bd_off[b0:b1].tolist(),
                bt_off[b0:b1].tolist(),
                bl_off[b0:b1].tolist(),
                int(cfs[r]),
            )
        )
    return out


# --- Elias-Fano doc-id codec (codec="ef") --------------------------------
# Per-BLOCK independent EF sections so WAND block skipping works exactly
# as with varint: a pruned block's bytes are never touched. Section
# layout: [l: 1 byte][u_local: varint][low bits][high bits]; the base of
# block b is block_last[b-1] + 1 (0 for block 0), so values are small
# block-local offsets. Lists shorter than EF_MIN_POSTINGS stay varint
# (the per-section header would dominate; web vocabularies are mostly
# single-block tail lists) — the codec column is per segment ROW.

EF_MIN_POSTINGS = BLOCK_SIZE


def _ef_section(vals: np.ndarray, u_local: int) -> bytes:
    from .ef import ef_encode

    enc = ef_encode(vals, universe=u_local)
    head = bytes([enc["l"]]) + varint_encode(
        np.array([u_local], dtype=np.uint64)
    )
    return head + enc["low_blob"] + enc["high_blob"]


def ef_encode_blocks(doc_ids: np.ndarray) -> tuple[bytes, list[int]]:
    """Encode a sorted doc-id list as per-block EF sections. Returns
    (blob, block byte offsets) — drop-in for the varint doc blob +
    block_doc_off pair."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    parts: list[bytes] = []
    offs: list[int] = []
    pos = 0
    base = np.int64(0)
    for b in range(nblocks):
        lo = b * BLOCK_SIZE
        hi = min(lo + BLOCK_SIZE, n)
        vals = (doc_ids[lo:hi].view(np.uint64) - np.uint64(base)).astype(
            np.uint64
        )
        u_local = int(vals[-1]) + 1
        sec = _ef_section(vals, u_local)
        offs.append(pos)
        parts.append(sec)
        pos += len(sec)
        base = doc_ids[hi - 1] + 1
    return b"".join(parts), offs


def _ef_decode_section(
    buf: bytes, count: int, base: np.uint64
) -> np.ndarray:
    from .ef import ef_decode

    l = buf[0]
    # u_local varint follows; find its length (continuation bits)
    i = 1
    while buf[i] & 0x80:
        i += 1
    u_local = int(varint_decode(buf[1 : i + 1], 1)[0])
    body = i + 1
    low_bytes = (count * l + 7) // 8
    high_bits = count + (u_local >> l) + 1
    high_bytes = (high_bits + 7) // 8
    enc = {
        "n": count,
        "universe": u_local,
        "l": l,
        "low_blob": buf[body : body + low_bytes],
        "high_blob": buf[body + low_bytes : body + low_bytes + high_bytes],
    }
    return (ef_decode(enc) + base).view(np.int64)


def ef_decode_block(
    doc_ids_blob: bytes,
    block_doc_off,
    block_last,
    n_postings: int,
    b: int,
) -> np.ndarray:
    nblocks = len(block_last)
    count = min(BLOCK_SIZE, n_postings - b * BLOCK_SIZE)
    end = block_doc_off[b + 1] if b + 1 < nblocks else len(doc_ids_blob)
    base = (
        np.uint64(0)
        if b == 0
        else np.int64(block_last[b - 1] + 1).view(np.uint64)
    )
    return _ef_decode_section(
        doc_ids_blob[block_doc_off[b] : end], count, base
    )


def ef_decode_all(
    doc_ids_blob: bytes, block_doc_off, block_last, n_postings: int
) -> np.ndarray:
    parts = [
        ef_decode_block(
            doc_ids_blob, block_doc_off, block_last, n_postings, b
        )
        for b in range(len(block_last))
    ]
    return (
        np.concatenate(parts)
        if parts
        else np.zeros(0, dtype=np.int64)
    )


def decode_block(
    doc_ids_blob: bytes,
    tfs_blob: bytes,
    dls_blob: bytes,
    n_postings: int,
    block_doc_off,
    block_tf_off,
    block_dl_off,
    block_last,
    b: int,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONLY block ``b`` of a posting list (the WAND skip path: a
    pruned block's bytes are never touched). Returns (doc_ids, tfs, dls)
    for the ``BLOCK_SIZE`` (or fewer, for the tail) postings of the block.
    ``codec`` selects the doc-id stream format ("varint" delta gaps or
    "ef" per-block Elias-Fano); tfs/dls are always varint."""
    nblocks = len(block_last)
    count = min(BLOCK_SIZE, n_postings - b * BLOCK_SIZE)
    t_end = block_tf_off[b + 1] if b + 1 < nblocks else len(tfs_blob)
    l_end = block_dl_off[b + 1] if b + 1 < nblocks else len(dls_blob)
    if codec == "ef":
        doc_ids = ef_decode_block(
            doc_ids_blob, block_doc_off, block_last, n_postings, b
        )
    else:
        d_end = block_doc_off[b + 1] if b + 1 < nblocks else len(doc_ids_blob)
        gaps = varint_decode(doc_ids_blob[block_doc_off[b] : d_end], count)
        # block 0's first gap is absolute; later blocks chain off the
        # previous block's last doc id (mod-2^64 arithmetic round-trips
        # signed ids)
        base = np.uint64(0) if b == 0 else np.int64(block_last[b - 1]).view(np.uint64)
        doc_ids = (base + delta_decode(gaps)).view(np.int64)
    tfs = varint_decode(tfs_blob[block_tf_off[b] : t_end], count).astype(np.int64)
    dls = varint_decode(dls_blob[block_dl_off[b] : l_end], count).astype(np.int64)
    return doc_ids, tfs, dls


def decode_block_range(
    doc_ids_blob: bytes,
    tfs_blob: bytes,
    dls_blob: bytes,
    n_postings: int,
    block_doc_off,
    block_tf_off,
    block_dl_off,
    block_last,
    b0: int,
    b1: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode blocks ``[b0, b1)`` of a varint posting list in ONE
    vectorized pass. Valid because consecutive varint blocks form a
    continuous gap stream: block b's first gap chains off
    ``block_last[b-1]``, so one varint_decode over the byte range plus
    one cumulative sum from ``block_last[b0-1]`` reproduces every id —
    the Block-Max WAND run-decode path (surviving blocks are grouped
    into consecutive runs instead of decoded one Python call at a
    time). EF lists must use ef_decode_block per block (each EF
    section has a block-local universe)."""
    nblocks = len(block_last)
    count = min(BLOCK_SIZE * b1, n_postings) - b0 * BLOCK_SIZE
    d_end = block_doc_off[b1] if b1 < nblocks else len(doc_ids_blob)
    t_end = block_tf_off[b1] if b1 < nblocks else len(tfs_blob)
    l_end = block_dl_off[b1] if b1 < nblocks else len(dls_blob)
    gaps = varint_decode(doc_ids_blob[block_doc_off[b0] : d_end], count)
    base = (
        np.uint64(0) if b0 == 0
        else np.int64(block_last[b0 - 1]).view(np.uint64)
    )
    doc_ids = (base + delta_decode(gaps)).view(np.int64)
    tfs = varint_decode(tfs_blob[block_tf_off[b0] : t_end], count).astype(np.int64)
    dls = varint_decode(dls_blob[block_dl_off[b0] : l_end], count).astype(np.int64)
    return doc_ids, tfs, dls


def decode_posting_list(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (doc_ids, tfs, dls) from a segment row (dict-like or Row).
    Dispatches on the row's ``codec`` field when present (absent rows and
    pre-codec indexes decode as varint)."""
    has_attr = hasattr(row, "n_postings")
    n = int(row.n_postings) if has_attr else int(row["n_postings"])
    get = (lambda k: getattr(row, k)) if has_attr else (lambda k: row[k])
    if has_attr:
        cdc = getattr(row, "codec", "varint") or "varint"
    else:
        cdc = row.get("codec", "varint") or "varint"
    if cdc == "ef":
        doc_ids = ef_decode_all(
            bytes(get("doc_ids_blob")),
            list(get("block_doc_off")),
            list(get("block_last")),
            n,
        )
    else:
        gaps = varint_decode(bytes(get("doc_ids_blob")), n)
        doc_ids = delta_decode(gaps).view(np.int64)
    tfs = varint_decode(bytes(get("tfs_blob")), n).astype(np.int64)
    dls = varint_decode(bytes(get("dls_blob")), n).astype(np.int64)
    return doc_ids, tfs, dls
