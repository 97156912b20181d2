"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual media DECODE is
stubbed behind ``_decode_image_stub`` because no image/audio libraries
exist in this container — swap the stub for PIL/torchaudio in production.
The stub is deterministic so tests can assert end-to-end behavior.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, checksum long, feat array<float>"


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: a real implementation would use PIL/libjpeg. Here we
    derive a deterministic fake 'pixel' array from the bytes so the
    downstream feature plumbing is exercised honestly."""
    if not payload:
        raise NotImplementedError("empty payload; real decoder not available in sandbox")
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(arr.size)), 1)
    return np.resize(arr, (side, side)).astype(np.float32)


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: decode (stub) -> pooled features.
    Batch shape: one Arrow batch of (media_id, kind, payload) rows in,
    one batch of fixed-width float features out."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                img = _decode_image_stub(payload)
                # mean-pool rows into feat_dim buckets (deterministic fake)
                pooled = np.array(
                    [float(c.mean()) for c in np.array_split(img.ravel(), feat_dim)],
                    dtype=np.float32,
                )
                rows.append(
                    (
                        r.media_id,
                        r.kind,
                        len(payload),
                        int(np.int64(struct.unpack("<q", (payload + b"\0" * 8)[:8])[0])),
                        pooled.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "checksum", "feat"]
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: emits (media_id, frame_idx) rows for
    frames 0, n, 2n... — decode itself is the same stub boundary."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def synth_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                16000 if kind == "audio" else None,
                120 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
