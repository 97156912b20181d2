"""Property-based round-trip fuzz for the from-spec media codecs.

GIF is lossless: decode(encode(px)) must be EXACT for any palette
image. JPEG is lossy but deterministic: the progressive encoder shares
the baseline quantizer, so progressive decode must be bit-identical to
baseline decode for ANY image, and the fused-window entropy path must
match the bit-at-a-time oracle path bit-for-bit."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tokenkit_spark.ops import jpeg
from tokenkit_spark.ops import multimodal as mm


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    ncol=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
)
def test_gif_roundtrip_fuzz(w, h, ncol, seed, interlace):
    rng = np.random.default_rng(seed)
    # distinct palette rows (unique() collapses duplicates, which would
    # make the expected image differ from the palette indexing)
    pal = np.array(
        [[c & 0xFF, (c * 31 + seed) & 0xFF, (c * 97 + 2 * seed) & 0xFF]
         for c in range(ncol)],
        dtype=np.uint8,
    )
    px = pal[rng.integers(0, ncol, size=(h, w))]
    out = mm.decode_gif(mm.make_gif(w, h, pixels=px, interlace=interlace))
    assert out is not None and np.array_equal(out, px)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 24),
    q=st.integers(30, 95),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
)
def test_jpeg_progressive_matches_baseline_fuzz(w, h, q, seed, gray):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=q))
    prog = jpeg.decode_jpeg(bytes(jpeg.encode_jpeg_progressive(px, quality=q)))
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 24),
    q=st.integers(30, 95),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_fast_path_matches_oracle_fuzz(w, h, q, seed):
    import os

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = bytes(jpeg.encode_jpeg(px, quality=q))
    prev = os.environ.get("TOKENKIT_JPEG_FAST")
    try:
        os.environ["TOKENKIT_JPEG_FAST"] = "0"
        a = jpeg.decode_jpeg(data)
        os.environ["TOKENKIT_JPEG_FAST"] = "1"
        b = jpeg.decode_jpeg(data)
    finally:
        if prev is None:
            os.environ.pop("TOKENKIT_JPEG_FAST", None)
        else:
            os.environ["TOKENKIT_JPEG_FAST"] = prev
    assert a is not None and np.array_equal(a, b)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
    mode=st.sampled_from(["rgb", "gray", "palette"]),
)
def test_png_roundtrip_fuzz(w, h, seed, interlace, mode):
    rng = np.random.default_rng(seed)
    if mode == "gray":
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        out = mm.decode_png(mm.make_png(w, h, pixels=px, interlace=interlace))
    elif mode == "rgb":
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = mm.decode_png(mm.make_png(w, h, pixels=px, interlace=interlace))
    else:
        ncol = int(rng.integers(1, 17))
        pal = np.array(
            [[c & 0xFF, (c * 31 + seed) & 0xFF, (c * 97) & 0xFF]
             for c in range(ncol)],
            dtype=np.uint8,
        )
        px = pal[rng.integers(0, ncol, size=(h, w))]
        out = mm.decode_png(
            mm.make_png(w, h, pixels=px, palette=True, interlace=interlace)
        )
    assert out is not None and np.array_equal(out, px)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
    top_down=st.booleans(),
)
def test_bmp_roundtrip_fuzz(w, h, seed, top_down):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = mm.decode_bmp(mm.make_bmp(w, h, pixels=px, top_down=top_down))
    assert out is not None and np.array_equal(out, px)
