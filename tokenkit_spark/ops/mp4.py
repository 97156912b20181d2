"""ISOBMFF (MP4) top-level box walk — the video-container sibling of
the PNG/JPEG/WAV header parsers in ``ops/multimodal.py``.

ISO/IEC 14496-12 §4.2 (the public ISO base media file format): an MP4
file is a flat sequence of boxes, each headed by a big-endian uint32
``size`` and a 4-character ``type``; ``size == 1`` means a 64-bit
``largesize`` follows the type (files > 4 GiB — common for crawl video
payloads), and ``size == 0`` means "box extends to end of file" (only
legal for the last box, typically ``mdat``).  A data pipeline never
needs to DECODE video to be useful — enumerating box structure gives
container type (``ftyp`` major brand), stream-metadata location
(``moov``) and payload extent (``mdat``) for routing, sampling, and
corruption screening; actual codec work stays behind the documented
decode boundary (``ops/multimodal.py``).

Scale shape: ``mapInPandas`` over the binary payload column — Arrow
ships the bytes batch-wise, the walk is a few header reads per file
(never materializes payload contents), no shuffle.  Malformed files
(truncated header, size over-running the payload) emit an ``err`` row
rather than failing the batch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

BOX_SCHEMA = (
    "doc_id long, box_idx int, box_type string, box_size long, "
    "offset long, err string"
)


def _walk(payload: bytes):
    """Yield (idx, type, size, offset) for the top-level boxes; raises
    ValueError on structural corruption."""
    off, idx, n = 0, 0, len(payload)
    while off < n:
        if off + 8 > n:
            raise ValueError(f"truncated box header at {off}")
        size = struct.unpack(">I", payload[off:off + 4])[0]
        btype = payload[off + 4:off + 8].decode("latin-1")
        if size == 1:
            if off + 16 > n:
                raise ValueError(f"truncated largesize at {off}")
            size = struct.unpack(">Q", payload[off + 8:off + 16])[0]
            if size < 16:
                raise ValueError(f"bad largesize {size} at {off}")
        elif size == 0:
            size = n - off
        elif size < 8:
            raise ValueError(f"bad size {size} at {off}")
        if off + size > n:
            raise ValueError(f"box {btype} overruns payload at {off}")
        yield idx, btype, size, off
        off += size
        idx += 1


def parse_mp4_boxes(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """One row per top-level box: (doc_id, box_idx, box_type,
    box_size, offset, err); corrupt payloads produce a single row with
    ``err`` set and NULL box fields."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "box_idx": [], "box_type": [],
                "box_size": [], "offset": [], "err": [],
            }
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    boxes = list(_walk(bytes(payload)))
                except ValueError as e:
                    out["doc_id"].append(did)
                    out["box_idx"].append(None)
                    out["box_type"].append(None)
                    out["box_size"].append(None)
                    out["offset"].append(None)
                    out["err"].append(str(e))
                    continue
                for idx, btype, size, off in boxes:
                    out["doc_id"].append(did)
                    out["box_idx"].append(idx)
                    out["box_type"].append(btype)
                    out["box_size"].append(size)
                    out["offset"].append(off)
                    out["err"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, BOX_SCHEMA)


def make_mp4(ftyp_brand: bytes, free_len: int, mdat_payload: bytes,
             largesize_mdat: bool = False) -> bytes:
    """Deterministic minimal MP4: ftyp(16) + free(8+free_len) + mdat.
    Test-fixture builder (the write side of the parse contract)."""
    ftyp = struct.pack(">I", 16) + b"ftyp" + ftyp_brand[:4].ljust(4) \
        + b"\x00\x00\x00\x01"
    free = struct.pack(">I", 8 + free_len) + b"free" + b"\x00" * free_len
    if largesize_mdat:
        mdat = (
            struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(mdat_payload)) + mdat_payload
        )
    else:
        mdat = struct.pack(">I", 8 + len(mdat_payload)) + b"mdat" \
            + mdat_payload
    return ftyp + free + mdat
