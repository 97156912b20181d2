"""Perceptual-hash image dedup: hash invariance under resize/re-encode,
separation of distinct patterns, and banded-LSH recall-completeness vs a
brute-force Hamming scan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops import multimodal as mm


def _gradient_img(h, w, phase=0.0):
    gx, gy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    return np.clip(
        np.stack([gx, gy, 128 + 100 * np.sin(gx / 40 + phase)], axis=2), 0, 255
    ).astype(np.uint8)


def _noise_img(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def _ham(a, b):
    return bin((a & (1 << 64) - 1) ^ (b & (1 << 64) - 1)).count("1")


def test_phash_invariant_under_resize():
    big = _gradient_img(64, 96)
    small = _resized = mm._resize_bilinear(big.astype(np.float64), 32, 48).astype(
        np.uint8
    )
    assert _ham(mm.phash64(big), mm.phash64(small)) <= 4


def test_phash_invariant_under_jpeg_reencode():
    img = _gradient_img(48, 48)
    png = mm.make_png(48, 48, pixels=img)
    jpg = mm.make_jpeg(48, 48, pixels=img, quality=90)
    h_png = mm.phash64(mm.decode_png(png))
    from tokenkit_spark.ops.jpeg import decode_jpeg

    h_jpg = mm.phash64(decode_jpeg(jpg))
    assert _ham(h_png, h_jpg) <= 6


def test_phash_separates_distinct_patterns():
    a = mm.phash64(_gradient_img(48, 48))
    b = mm.phash64(_noise_img(48, 48, seed=1))
    assert _ham(a, b) > 12


def test_banded_near_dups_match_bruteforce(spark):
    rows = []
    for i in range(12):
        if i < 6:
            img = _gradient_img(32 + 4 * i, 48, phase=0.02 * i)  # one family
        else:
            img = _noise_img(40, 40, seed=i)  # singletons
        rows.append((i, "image", bytearray(mm.make_png(*img.shape[1::-1], pixels=img))))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    hashes = mm.image_phashes(media).cache()
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_near_dups(hashes, max_hamming=6).collect()
    }
    hs = {r.media_id: r.phash for r in hashes.collect()}
    want = {}
    ids = sorted(hs)
    for i in ids:
        for j in ids:
            if i < j and _ham(hs[i], hs[j]) <= 6:
                want[(i, j)] = _ham(hs[i], hs[j])
    assert got == want
    assert len(want) >= 3  # the gradient family genuinely collides


def test_max_hamming_bound_enforced(spark):
    media = spark.createDataFrame(
        [(0, "image", bytearray(mm.make_png(16, 16)))],
        "media_id long, kind string, payload binary",
    )
    hashes = mm.image_phashes(media)
    with pytest.raises(ValueError, match="recall-complete"):
        mm.phash_near_dups(hashes, max_hamming=8)
