"""Session-L batch 38: token fertility, props drift, OG
completeness."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_token_fertility(spark):
    from tokenkit_spark.ops.textstats import token_fertility

    docs = spark.createDataFrame(
        [
            (0, "en", "hello world"),        # 11 chars, 2 ws, 2 sub
            (1, "en", "ab3cd ef"),           # 8 chars, 2 ws, 4 sub
        ],
        "doc_id long, lang string, text string",
    )
    r = {x.lang: x for x in token_fertility(docs).collect()}["en"]
    assert r.ws_tokens == 4
    assert r.subword_units == 6  # hello, world, ab, 3, cd, ef
    assert r.total_chars == 19
    # chars/ws-token 19/4 and subwords/word 6/4 are derivable


def test_props_schema_drift(spark):
    from tokenkit_spark.ops.events import props_schema_drift

    rows = [
        (dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"k": 1}'),
        (dt.datetime(2024, 1, 8), 1, "a", 1.0, '{"k": 2, "v": 3}'),
        (dt.datetime(2024, 1, 15), 1, "a", 1.0, '{"v": 4}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r.week: r for r in props_schema_drift(ev).collect()}
    assert out["2024-01-01"].keys_csv == "k"
    w2 = out["2024-01-08"]
    assert w2.n_new == 1 and w2.n_dropped == 0
    w3 = out["2024-01-15"]
    assert w3.n_new == 0 and w3.n_dropped == 1
    assert w3.keys_csv == "v"


def test_og_completeness(spark):
    from tokenkit_spark.ops.htmlmeta import og_completeness_audit

    full = (
        '<meta property="og:title" content="t">'
        '<meta property="og:type" content="article">'
        '<meta property="og:image" content="/i.png">'
        '<meta property="og:url" content="/u">'
    )
    pages = spark.createDataFrame(
        [
            ("h", full),
            ("h", '<meta property="og:title" content="only title">'),
            ("h", "<p>nothing</p>"),
        ],
        "host string, html string",
    )
    r = og_completeness_audit(pages).collect()[0]
    assert r.n_complete == 1 and r.n_partial == 1 and r.n_absent == 1
    assert r.n_title == 2 and r.n_image == 1
    assert r.n_pages == 3


def test_media_decode_coverage_statuses(spark):
    """VERDICT r03 item 8: JPEG decode support must be measurable —
    decodable payloads (baseline AND progressive, as of round 5) count
    "ok"; header-only/truncated/garbage payloads get an explicit status
    instead of silently dropping out."""
    import numpy as np

    from tokenkit_spark.ops import jpeg, multimodal

    base = multimodal.make_jpeg(
        24, 16, pixels=np.zeros((16, 24, 3), dtype=np.uint8), quality=90
    )
    prog = jpeg.encode_jpeg_progressive(
        np.full((16, 24, 3), 60, dtype=np.uint8), quality=90
    )
    rows = [
        (0, "image", bytearray(base), None, None, None, None),
        (1, "image", bytearray(jpeg.make_progressive_stub()),
         None, None, None, None),
        (2, "image", bytearray(base[:20]), None, None, None, None),
        (3, "image", bytearray(b"garbage"), None, None, None, None),
        (4, "image", bytearray(multimodal.make_png(8, 8)),
         None, None, None, None),
        (5, "image", bytearray(prog), None, None, None, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {
        (r.kind, r.format, r.status): r.n
        for r in multimodal.media_decode_coverage(media).collect()
    }
    assert out[("image", "jpeg", "ok")] == 2  # baseline + progressive
    # header-only SOF2 stub (no scan) + truncated baseline
    assert out[("image", "jpeg", "malformed")] == 2
    assert out[("image", "unknown", "unknown")] == 1
    assert out[("image", "png", "ok")] == 1
    # and the classifier agrees with the decoder's actual support
    assert jpeg.decode_jpeg(base) is not None
    assert jpeg.decode_jpeg(bytes(prog)) is not None
    assert jpeg.decode_jpeg(jpeg.make_progressive_stub()) is None
