"""Pipeline ops tests: dedup, similarity, text stats, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tokenkit_spark.ops import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base),  # exact dup of 0
        Row(doc_id=2, text=base.replace("today", "tonight")),  # near dup
        Row(doc_id=3, text="completely different content about spark and indexes"),
        Row(doc_id=4, text="el la de que y en un una es por con los amigos"),
        Row(doc_id=5, text="the of and to a in is for on with that it"),
        Row(doc_id=6, text="dog lazy the near bank river the over jumps fox brown quick the today"),  # permuted 0
    ]
    return spark.createDataFrame(rows).cache()


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0].dup_count == 2 and out[0].min_doc_id == 0


def test_minhash_finds_near_dups(docs):
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.n_shared_bands
        for r in dedup.minhash_candidates(docs, num_perm=64, bands=16).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 16  # identical docs share all bands
    assert (0, 2) in pairs  # near dup shares some band
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_minhash_deterministic(docs):
    a = dedup.minhash_candidates(docs, num_perm=32, bands=8).collect()
    b = dedup.minhash_candidates(docs, num_perm=32, bands=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_near_dups(docs):
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.hamming for r in dedup.simhash_candidates(docs).collect()
    }
    assert pairs.get((0, 1)) == 0          # identical -> same simhash
    assert pairs.get((0, 6)) == 0          # bag-of-words permutation -> same tf weights
    # one-word change on a 14-token doc flips many bits (tiny-doc regime);
    # banding only guarantees candidates for hamming <= 3, so (0,2) may or
    # may not appear — but unrelated docs must not collide at distance 0
    assert all(h == 0 for (a, b), h in pairs.items() if {a, b} <= {0, 1, 6})
    assert (0, 3) not in pairs or pairs[(0, 3)] > 0


def test_ngram_jaccard(docs):
    out = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert out.get((0, 1)) == 1.0
    assert (0, 2) in out and 0.5 <= out[(0, 2)] < 1.0
    assert (0, 3) not in out


def test_ngram_jaccard_gram_df_cap(spark):
    """Head-gram skew (VERDICT r01 item 4): every doc shares one
    boilerplate sentence; without the cap the self-join on its grams is
    quadratic in corpus size. With the cap the boilerplate grams are
    stripped before the join, and true near-dups (carried by their OWN
    rare grams) still surface with exact Jaccard over the reduced space."""
    boiler = "subscribe to our newsletter for updates and offers today"
    rows = [
        Row(doc_id=i, text=f"{boiler} unique content piece number {i} alpha beta")
        for i in range(50)
    ]
    # 100/101: real near-dups beyond the boilerplate
    rows += [
        Row(doc_id=100, text=f"{boiler} the quick brown fox jumps over the lazy dog"),
        Row(doc_id=101, text=f"{boiler} the quick brown fox jumps over the lazy cat"),
    ]
    docs = spark.createDataFrame(rows)
    capped = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.4, max_gram_df=5
        ).collect()
    }
    assert (100, 101) in capped
    # boilerplate-only overlaps must NOT survive: docs 0..49 share only
    # the capped grams, so no pair among them appears
    assert not any(a < 50 and b < 50 for a, b in capped)
    # exactness over the reduced space: doc 100/101 each keep the 8
    # trigrams of their own sentence (boiler-crossing grams have df 1-2
    # except pure-boiler ones); verify the computed jaccard equals the
    # manual reduced-space value
    def grams(t, keep):
        ws = t.split()
        gs = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        return {g for g in gs if keep(g)}

    all_texts = {r.doc_id: r.text for r in rows}
    from collections import Counter

    df = Counter()
    per_doc = {}
    for d, t in all_texts.items():
        ws = t.split()
        gs = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        per_doc[d] = gs
        df.update(gs)
    kept = {d: {g for g in gs if df[g] <= 5} for d, gs in per_doc.items()}
    inter = len(kept[100] & kept[101])
    want = inter / len(kept[100] | kept[101])
    assert abs(capped[(100, 101)] - want) < 1e-9


def test_ngram_jaccard_default_cap_survives_head_skew(spark):
    """VERDICT r02 item 2: the DEFAULT must be a finite cap so the
    quadratic self-join can never detonate by omission. 10_050 docs share
    one boilerplate sentence; uncapped, its grams alone would emit ~5e7
    join rows. Under the default cap the boilerplate grams are stripped
    before the join, the query completes, and the one true near-dup pair
    (carried by its own rare grams) still surfaces."""
    import inspect

    assert inspect.signature(dedup.ngram_jaccard_pairs).parameters[
        "max_gram_df"
    ].default == 10_000

    boiler = "click here to accept all cookies on this site"
    rows = [
        Row(doc_id=i, text=f"{boiler} item {i} only") for i in range(10_050)
    ]
    rows += [
        Row(doc_id=20_000, text=f"{boiler} the quick brown fox jumps over the lazy dog"),
        Row(doc_id=20_001, text=f"{boiler} the quick brown fox jumps over the lazy cat"),
    ]
    docs = spark.createDataFrame(rows)
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.4).collect()
    }
    assert (20_000, 20_001) in got
    assert not any(a < 10_050 and b < 10_050 for a, b in got)


def test_cosine_topk_exact_vs_batch(spark):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[7]]
    exact = similarity.cosine_topk(emb, q, k=5).collect()
    batch = similarity.cosine_topk_batch(emb, q, k=5).collect()
    assert exact[0].vec_id == 7 and batch[0].vec_id == 7
    assert [r.vec_id for r in exact] == [r.vec_id for r in batch]
    for a, b in zip(exact, batch):
        assert abs(a.cosine - b.cosine) < 1e-9

    # numpy brute check
    sims = vecs @ np.asarray(q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    expected = np.lexsort((np.arange(50), -sims))[:5]
    assert [r.vec_id for r in exact] == expected.tolist()


def test_lsh_recalls_self(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[42]]
    out = similarity.lsh_cosine_topk(emb, q, k=3, n_planes=12, max_hamming=3).collect()
    assert out and out[0].vec_id == 42


def test_detect_language(docs):
    out = {r.doc_id: r.lang for r in docs.select(
        "doc_id", textstats.detect_language(F.col("text")).alias("lang")
    ).collect()}
    assert out[5] == "en"
    assert out[4] == "es"


def test_quality_and_counts(docs):
    q = {r.doc_id: r for r in textstats.quality_features(docs).collect()}
    assert q[0].n_tokens == 14
    assert 0.0 <= q[0].quality_score <= 1.0
    c = {r.doc_id: r for r in textstats.token_counts(docs).collect()}
    assert c[0].ws_tokens == 14 and c[0].bpe_tokens == 14


def test_repetition_signals(spark):
    """Gopher-style signals against hand-computed values."""
    rows = [
        Row(doc_id=0, text="a b\na b\nc d"),          # 1 dup line of 3
        Row(doc_id=1, text="- item one\n- item two\nplain"),  # 2 bullets of 3
        Row(doc_id=2, text="wait for it...\nmore…\nok"),      # 2 ellipsis of 3
        Row(doc_id=3, text="x y x y x y"),             # "x y" covers all pairs
        Row(doc_id=4, text="## #tag @user"),           # symbols
        Row(doc_id=5, text="one"),                     # single token: no grams
    ]
    out = {
        r.doc_id: r
        for r in textstats.repetition_signals(spark.createDataFrame(rows)).collect()
    }
    assert out[0].dup_line_frac == round(1 / 3, 4)
    assert out[1].bullet_line_frac == round(2 / 3, 4)
    assert out[2].ellipsis_line_frac == round(2 / 3, 4)
    # "x y x y x y": 5 bigrams, "x y" occurs 3 times -> 6/6 tokens covered
    assert out[3].top_2gram_frac == 1.0
    assert out[4].symbol_ratio == round(4 / len("## #tag @user"), 4)
    assert out[5].top_2gram_frac == 0.0


def test_fingerprint_order_insensitive(docs):
    fp = {r.doc_id: r.fingerprint for r in textstats.fingerprints(docs).collect()}
    assert fp[0] == fp[1] == fp[6]  # same bag of words
    assert fp[0] != fp[3]


def test_multimodal_features(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media, feat_dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feat) == 8 and r.n_bytes > 0
    # deterministic across runs
    again = multimodal.extract_features(multimodal.synth_media(spark, n=30)).collect()
    assert sorted(r.checksum for r in feats) == sorted(r.checksum for r in again)


def test_media_header_parsing(spark):
    """Real header extraction: dimensions/sample rates come from the
    actual PNG/JPEG/WAV bytes, matching what synth_media encoded."""
    media = multimodal.synth_media(spark, n=30)
    got = {r.media_id: r for r in multimodal.parse_media_headers(media).collect()}
    assert len(got) == 30
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        r = got[i]
        if kind == "image":
            w, h = multimodal.synth_media_dims(i)
            assert r.format == ("png" if i % 2 == 0 else "jpeg")
            assert (r.width, r.height) == (w, h)
        elif kind == "audio":
            assert r.format == "wav"
            assert r.sample_rate == 8000 * (1 + i % 3)
            assert r.n_channels == 1 + i % 2
        else:
            assert r.format == "unknown"
            assert r.width is None and r.sample_rate is None


def test_media_header_parsers_pure():
    from tokenkit_spark.ops.multimodal import (
        make_jpeg, make_png, make_wav, parse_audio_header, parse_image_header)

    assert parse_image_header(make_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(make_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\0\0"
    assert parse_image_header(gif) == ("gif", 320, 200)
    assert parse_audio_header(make_wav(44100, 2)) == ("wav", 44100, 2)
    assert parse_image_header(b"not an image") is None
    assert parse_audio_header(b"RIFFxxxxJUNK") is None
    assert parse_image_header(b"") is None


def test_frame_sampling(spark):
    media = multimodal.synth_media(spark, n=9)
    frames = multimodal.frame_sample(media, every_n=30).collect()
    vids = [r for r in frames]
    assert vids and all(r.frame_idx % 30 == 0 for r in vids)

def test_embedding_near_dup_pairs(spark):
    """Exact pairs match numpy brute force; LSH output is a subset with
    decent recall on near-duplicate (perturbed) vectors."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    # 10 near-dups: tiny perturbations of the first 10 vectors
    dups = base[:10] + rng.standard_normal((10, 16)).astype(np.float32) * 0.05
    vecs = np.vstack([base, dups])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.cosine_pairs_exact(emb, threshold=0.95).collect()
    }
    v64 = vecs.astype(np.float64)
    sims = (v64 @ v64.T) / np.outer(
        np.linalg.norm(v64, axis=1), np.linalg.norm(v64, axis=1)
    )
    want = {
        (a, b): sims[a, b]
        for a in range(50)
        for b in range(a + 1, 50)
        if sims[a, b] >= 0.95
    }
    assert set(exact) == set(want)
    for p, c in exact.items():
        assert abs(c - want[p]) < 1e-9
    assert all((i, i + 40) in exact for i in range(10))  # planted dups found

    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.embedding_near_dups(
            emb, dim=16, threshold=0.95, n_planes=16, bands=8
        ).collect()
    }
    assert set(lsh) <= set(exact)  # precision 1 after re-scoring
    assert len(lsh) >= 0.8 * len(exact)  # high recall at these settings

def test_ivf_cosine_topk(spark):
    """IVF path: quantizer trained on a sample, distributed assignment,
    nprobe search. On clustered data recall@10 vs brute force >= 0.9."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = np.vstack(
        [centers[i % 8] + rng.standard_normal(16) for i in range(400)]
    ).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    cent = similarity.train_ivf_centroids(emb, n_centroids=8, iters=8)
    assert cent.shape == (8, 16)
    q = [float(x) for x in vecs[123]]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, q, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.ivf_cosine_topk(emb, cent, q, k=10, nprobe=2).collect()
    ]
    assert approx[0] == 123
    assert len(set(exact) & set(approx)) >= 9
    # nprobe = all centroids ==> identical to brute force
    full = [
        r.vec_id
        for r in similarity.ivf_cosine_topk(emb, cent, q, k=10, nprobe=8).collect()
    ]
    assert full == exact


def test_signature_values_pinned():
    """Exact MinHash/SimHash values pinned: the hash families are part of
    the on-disk contract for incremental dedup (signatures computed in a
    later run must match stored ones) — any change must be deliberate."""
    import pandas as pd

    mh_inner = dedup.minhash_udf(num_perm=8, shingle_k=5).func
    mh = list(mh_inner(iter([pd.Series(["hello world", "the quick brown fox"])])))[0]
    assert list(map(int, mh[0]))[:4] == [
        2105122737025889897, 2361447967059711586,
        860524341979122061, 3188648940194760366]
    assert list(map(int, mh[1]))[:4] == [
        260244534602265666, 699981407495123172,
        229981994015313540, 137314580710861999]
    sh_inner = dedup.simhash_udf().func
    sh = list(sh_inner(iter([pd.Series(["hello world", "the quick brown fox", ""])])))[0]
    assert list(sh) == [2330102641553572904, 4613045069828587658, 0]


def test_normalize_url_and_url_duplicates(spark):
    cases = [
        # tracking decoration + www + default port + fragment + case
        ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&q=1#frag",
         "http://example.com/Path?q=1"),
        ("http://example.com/Path?q=1", "http://example.com/Path?q=1"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com/?utm_campaign=a&fbclid=zz", "https://example.com"),
        ("https://example.com:443/a/b/", "https://example.com/a/b"),
        ("http://host:8080/x", "http://host:8080/x"),     # non-default port kept
        ("example.com/page", "example.com/page"),          # scheme-less untouched
        ("https://site.org/p?a=1&utm_x=2&b=3", "https://site.org/p?a=1&b=3"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(dedup.normalize_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]

    pages = spark.createDataFrame(
        [("http://www.a.com/x?utm_source=mail",),
         ("http://a.com/x",),
         ("https://b.com/y",)],
        "url string",
    )
    dups = dedup.url_duplicates(pages).collect()
    assert len(dups) == 1
    assert dups[0].canonical_url == "http://a.com/x" and dups[0].dup_count == 2


def test_wav_pcm_decode_roundtrip():
    """Real PCM decode: samples written by make_wav come back exactly
    (16-bit quantization aside), and analytic signal features match."""
    from tokenkit_spark.ops.multimodal import decode_wav_pcm, make_wav

    rate, freq = 16000, 440.0
    t = np.arange(int(rate * 0.1)) / rate
    sig = 0.5 * np.sin(2 * np.pi * freq * t)
    dec = decode_wav_pcm(make_wav(rate, n_channels=2, samples=sig))
    assert dec is not None
    samples, got_rate = dec
    assert got_rate == rate and samples.shape == (len(t), 2)
    assert np.abs(samples[:, 0] - sig).max() < 2e-4  # 16-bit quantization
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    rms = float(np.sqrt(np.mean(samples[:, 0] ** 2)))
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    assert decode_wav_pcm(b"not audio") is None


def test_audio_features_spark(spark):
    media = multimodal.synth_media(spark, n=30)
    out = {r.media_id: r for r in multimodal.audio_features(media).collect()}
    assert len(out) == 30
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        r = out[i]
        if kind != "audio":
            assert r.sample_rate is None and r.rms is None
            continue
        rate, freq = 8000 * (1 + i % 3), 200.0 * (1 + i % 4)
        assert r.sample_rate == rate
        assert r.n_frames == int(rate * 0.05)
        assert abs(r.duration_s - r.n_frames / rate) < 1e-9
        assert abs(r.rms - 0.5 / np.sqrt(2)) < 5e-3
        assert abs(r.peak - 0.5) < 5e-3
        # sine zero-crossing rate ~ 2f/rate
        assert abs(r.zero_cross_rate - 2 * freq / rate) < 0.01


def test_png_decode_roundtrip_and_filters():
    """Real PNG decode: encode->decode round-trips exactly, and all five
    scanline filter types reverse correctly (hand-filtered fixture)."""
    import struct as _struct
    import zlib

    from tokenkit_spark.ops.multimodal import _png_chunk, decode_png, make_png

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(13, 17, 3)).astype(np.uint8)
    out = decode_png(make_png(17, 13, pixels=rgb))
    assert out is not None and (out == rgb).all()
    gray = rng.integers(0, 256, size=(9, 7)).astype(np.uint8)
    out = decode_png(make_png(7, 9, pixels=gray))
    assert (out == gray).all()

    # hand-build a grayscale PNG using every filter type (PNG spec §6)
    img = rng.integers(0, 256, size=(5, 6)).astype(np.int32)
    lines = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y]
        prev = img[y - 1] if y > 0 else np.zeros(6, dtype=np.int32)
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = cur - np.concatenate(([0], cur[:-1]))
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.concatenate(([0], cur[:-1]))
            enc = cur - ((left + prev) >> 1)
        else:
            enc = np.zeros(6, dtype=np.int32)
            for x in range(6):
                a = int(cur[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = int(cur[x]) - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
    ihdr = _struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))
    got = decode_png(blob)
    assert got is not None and (got == (img & 0xFF).astype(np.uint8)).all()

    assert decode_png(b"notapng") is None
    assert decode_png(make_png(4, 4)) is None  # header-only: no IDAT


def test_extract_features_uses_real_png_pixels(spark):
    """PNG rows pool REAL decoded pixels: the first feature bucket of a
    known gradient image must match the numpy computation."""
    from tokenkit_spark.ops.multimodal import make_png

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(8, dtype=np.uint8)[None, :] * 30
    media = spark.createDataFrame(
        [(0, "image", bytearray(make_png(8, 8, pixels=px)), 8, 8, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    feat = multimodal.extract_features(media, feat_dim=4).collect()[0].feat
    want = [float(c.mean()) for c in np.array_split(px.astype(np.float32).ravel(), 4)]
    assert np.allclose(feat, want, rtol=1e-6)


def test_scrub_pii(spark):
    from tokenkit_spark.ops.pii import scrub_pii

    rows = [
        Row(doc_id=0, text="mail a.b+c@ex-ample.co.uk and x@y.io now"),
        Row(doc_id=1, text="server at 192.168.0.1 and 10.0.0.255 up"),
        Row(doc_id=2, text="call +1 555-010-1234 or 555 0100 9999"),
        Row(doc_id=3, text="mixed joe@a.com 8.8.8.8 555-123-4567"),
        Row(doc_id=4, text="nothing personal here at all"),
        Row(doc_id=5, text=""),
    ]
    out = {r.doc_id: r for r in scrub_pii(spark.createDataFrame(rows)).collect()}
    assert out[0].clean_text == "mail [EMAIL] and [EMAIL] now"
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (2, 0, 0)
    assert out[1].clean_text == "server at [IP] and [IP] up"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 2, 0)
    assert out[2].clean_text == "call +1 [PHONE] or [PHONE]"
    assert out[2].n_phones == 2
    # ordering contract: the IP is consumed before the phone pattern runs
    assert out[3].clean_text == "mixed [EMAIL] [IP] [PHONE]"
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (1, 1, 1)
    assert out[4].clean_text == rows[4].text
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (0, 0, 0)
    assert out[5].clean_text == ""


def _cc(spark, edges, **kw):
    from tokenkit_spark.ops.clustering import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.component for r in connected_components(df, **kw).collect()}


def test_connected_components_topologies(spark):
    # path graph 1-2-3-4-5 (worst case for naive propagation)
    assert _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == {
        i: 1 for i in range(1, 6)
    }
    # two cliques + an isolated edge, mixed orientation and dup edges
    edges = [(10, 11), (11, 12), (12, 10), (20, 21), (21, 22), (22, 20),
             (31, 30), (10, 11), (11, 10)]
    want = {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 30}
    assert _cc(spark, edges) == want
    # star rooted at the LARGEST id — min must still win
    assert _cc(spark, [(100, 1), (100, 2), (100, 3)]) == {
        100: 1, 1: 1, 2: 1, 3: 1
    }
    # self-loops only: no components emitted
    assert _cc(spark, [(7, 7)]) == {}


def test_dedup_clusters_representatives(spark):
    from tokenkit_spark.ops.clustering import dedup_clusters

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(8)])
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "src long, dst long"
    )
    out = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(out) == 8
    assert {i: out[i].component for i in range(8)} == {
        0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1, 6: 6, 7: 6
    }
    kept = {i for i in range(8) if out[i].is_representative}
    assert kept == {0, 1, 2, 4, 6}


def test_tfidf_keywords_and_pmi(spark):
    import math

    docs = spark.createDataFrame([
        Row(doc_id=0, text="new york city is big and new york is busy"),
        Row(doc_id=1, text="the city of new york has new people"),
        Row(doc_id=2, text="big data and big models in the city"),
    ])
    kw = {r.doc_id: r for r in textstats.tfidf_keywords(docs, top_n=1).collect()}
    # doc 0: 'is' tf=2, df=1 -> uniquely top; rank on rounded tf*idf
    assert kw[0].term == "is" and kw[0].tf == 2
    assert kw[0].score == round(2 * math.log(1 + (3 - 1 + 0.5) / 1.5), 6)
    # doc 2: data/in/models (tf=1, df=1, score 0.9808) beat big
    # (tf=2, df=2, score 0.9400); the three-way tie breaks term-asc
    assert kw[2].term == "data"
    assert kw[2].score == round(math.log(1 + (3 - 1 + 0.5) / 1.5), 6)

    pmi = {r.bigram: r for r in
           textstats.pmi_collocations(docs, min_count=2, top_n=5).collect()}
    # hand-computed: T=26 tokens, B=23 bigrams
    assert set(pmi) == {"new york", "the city"}
    assert pmi["new york"].n_pair == 3
    assert pmi["new york"].pmi == round(
        math.log((3 / 23) / ((4 / 26) * (3 / 26))), 4
    )
    assert pmi["the city"].pmi == round(
        math.log((2 / 23) / ((2 / 26) * (3 / 26))), 4
    )
    assert pmi["the city"].rank == 1 and pmi["new york"].rank == 2


def test_stratified_sample_deterministic(spark):
    import hashlib

    from tokenkit_spark.ops.sampling import mix_rates, stratified_sample

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 3}") for i in range(300)]
    )
    rates = {"s0": 1.0, "s1": 0.4}
    got = sorted(
        r.doc_id for r in stratified_sample(docs, rates, salt="x").collect()
    )

    def frac(i):
        return int(hashlib.md5(f"{i}x".encode()).hexdigest()[:8], 16) / 2**32

    want = sorted(
        i for i in range(300)
        if frac(i) < rates.get(f"s{i % 3}", 0.0)
    )
    assert got == want  # exact hash replay, s2 dropped entirely
    assert got == sorted(
        r.doc_id for r in stratified_sample(docs, rates, salt="x").collect()
    )  # rerun-stable
    # a different salt decorrelates the sample
    other = sorted(r.doc_id for r in stratified_sample(docs, rates, salt="y").collect())
    assert other != got

    # mix_rates: 50/50 mix of 60 rows from strata of 100 each -> 0.3 both
    r = mix_rates(docs, {"s0": 0.5, "s1": 0.5}, total=60)
    assert r == {"s0": 0.3, "s1": 0.3}
    # undersupply caps at 1.0
    r = mix_rates(docs, {"s0": 1.0}, total=500)
    assert r == {"s0": 1.0}


def test_ngram_contamination_and_shared_spans(spark):
    from tokenkit_spark.ops.contamination import (
        ngram_contamination,
        shared_span_pairs,
    )

    train = spark.createDataFrame([
        Row(doc_id=0, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=1, text="x alpha beta gamma delta y"),      # shares 4-gram w/ 0
        Row(doc_id=2, text="totally unrelated words here now"),
        Row(doc_id=3, text="alpha beta gamma delta epsilon zeta"),  # dup of 0
    ])
    ev = spark.createDataFrame(
        [Row(doc_id=100, text="beta gamma delta epsilon")]
    )
    got = {
        (r.doc_id, r.eval_id): r.n_shared_grams
        for r in ngram_contamination(train, ev, n=4).collect()
    }
    # doc0 contains 'beta gamma delta epsilon' (1 gram); doc1 lacks epsilon
    assert got == {(0, 100): 1, (3, 100): 1}

    pairs = {
        (r.doc_id_a, r.doc_id_b): r.n_shared_grams
        for r in shared_span_pairs(train, n=4).collect()
    }
    # 0<->3 identical: 3 distinct 4-grams; 0<->1 and 1<->3 share
    # 'alpha beta gamma delta'
    assert pairs == {(0, 3): 3, (0, 1): 1, (1, 3): 1}

    # df cap: the gram shared by all three (alpha beta gamma delta, df=3)
    # is boilerplate at cap 2 -> only the 0<->3 pair (via rarer grams)
    capped = {
        (r.doc_id_a, r.doc_id_b): r.n_shared_grams
        for r in shared_span_pairs(train, n=4, max_gram_df=2).collect()
    }
    assert capped == {(0, 3): 2}


def test_bigram_lm_perplexity_matches_python(spark):
    """Self-scored corpus AND cross-scored (unseen bigrams/unigrams hit
    the smoothed floor); a one-token doc has no bigrams and is absent."""
    import math
    from collections import Counter

    model_rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "a cat and a dog"),
    ]
    score_rows = model_rows + [
        (3, "the cat sat"),            # all seen
        (4, "zebra quantum the cat"),  # unseen unigrams + bigrams
        (5, "word"),                   # 1 token -> absent
    ]
    alpha = 0.1
    toks = lambda s: s.lower().split()
    uni = Counter(w for _, t in model_rows for w in toks(t))
    pairs = Counter(
        (ws[i], ws[i + 1]) for _, t in model_rows for ws in [toks(t)] for i in range(len(ws) - 1)
    )
    v = len(uni)

    def ppl(text):
        ws = toks(text)
        lps = [
            math.log((pairs.get((a, b), 0) + alpha) / (uni.get(a, 0) + alpha * v))
            for a, b in zip(ws, ws[1:])
        ]
        return round(math.exp(-sum(lps) / len(lps)), 4) if lps else None

    model = spark.createDataFrame(model_rows, "doc_id long, text string")
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")

    got = {
        r.doc_id: (r.n_bigrams, r.ppl)
        for r in textstats.bigram_lm_perplexity(docs, model, alpha).collect()
    }
    assert 5 not in got
    for did, text in score_rows[:-1]:
        assert got[did] == (len(toks(text)) - 1, ppl(text)), (did, text)

    # self-scored: model defaults to the scored corpus itself
    self_got = {
        r.doc_id: r.ppl for r in textstats.bigram_lm_perplexity(model, alpha=alpha).collect()
    }
    assert set(self_got) == {0, 1, 2}
    # fluent (all-seen) docs score lower ppl than the unseen-heavy doc
    assert max(self_got.values()) < got[4][1]


def test_pmi_survives_one_token_doc(spark):
    """Regression: sequence(1, 0) counts DOWN in Spark — a single-token
    document must not crash bigram generation."""
    df = spark.createDataFrame(
        [("word",), ("a b a b",), ("a b",)], "text string"
    )
    rows = textstats.pmi_collocations(df, min_count=1).collect()
    assert {r.bigram for r in rows} == {"a b", "b a"}


def test_remove_boilerplate_lines(spark):
    from tokenkit_spark.ops.textstats import remove_boilerplate_lines

    rows = [
        (0, "header\nunique zero\nfooter"),
        (1, "header\nunique one\nfooter"),
        (2, "header\nrare line\nfooter"),
        (3, "footer"),  # every line boilerplate -> kept as empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cleaned
        for r in remove_boilerplate_lines(df, min_df=2).collect()
    }
    assert got == {0: "unique zero", 1: "unique one", 2: "rare line", 3: ""}
    # min_df above every line's df keeps text intact
    intact = {
        r.doc_id: r.cleaned
        for r in remove_boilerplate_lines(df, min_df=99).collect()
    }
    assert intact == {r[0]: r[1] for r in rows}


def test_semantic_dedup_matches_reference_kernel(spark):
    """Hand-built clusters + a randomized cross-check against a plain
    numpy re-implementation of the SemDeDup triangular-max rule."""
    import numpy as np

    from tokenkit_spark.ops.similarity import semantic_dedup

    cents = np.array([[1, 0, 0, 0], [0, 0, 1, 0]], dtype=np.float64)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),   # near-dup of 0
        (2, [1.0, 0.5, 0.0, 0.0]),      # same cluster, below threshold
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 2.0, 0.0]),      # exact dup of 3 (scaled)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.id: (r.centroid_id, r.keep)
        for r in semantic_dedup(df, cents, threshold=0.95).collect()
    }
    # ascending centroid-sim scan: among dups {0, 1}, the LESS
    # centroid-similar member (1) is kept — the paper's retention rule;
    # exact dups {3, 4} tie on centroid-sim, id-asc keeps 3
    assert got == {0: (0, False), 1: (0, True), 2: (0, True), 3: (1, True), 4: (1, False)}

    # randomized parity vs reference loop
    rng = np.random.default_rng(7)
    x = rng.normal(size=(60, 4))
    # inject duplicates
    for i in range(0, 30, 5):
        x[i + 1] = x[i] + rng.normal(scale=0.01, size=4)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    assign = np.argmax(xn @ cents.T / np.linalg.norm(cents, axis=1), axis=1)

    def ref_keep(threshold=0.9):
        keep = {}
        for c in np.unique(assign):
            idx = np.flatnonzero(assign == c)
            csim = xn[idx] @ (cents[c] / np.linalg.norm(cents[c]))
            order = idx[np.lexsort((idx, csim))]
            for pos, i in enumerate(order):
                m = max((xn[i] @ xn[j] for j in order[:pos]), default=-1.0)
                keep[i] = m <= threshold
        return keep

    df2 = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<float>",
    )
    got2 = {
        r.id: r.keep for r in semantic_dedup(df2, cents, threshold=0.9, row_block=7).collect()
    }
    assert got2 == ref_keep(0.9)


def test_jpeg_codec_round_trip():
    """From-spec baseline JPEG codec: encode->decode round-trips within
    quantization error across 4:4:4, 4:2:0, grayscale, and restart-
    marker variants; unsupported/garbage payloads return None."""
    import numpy as np

    from tokenkit_spark.ops.jpeg import decode_jpeg, encode_jpeg

    h, w = 40, 56
    gx, gy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    img = np.clip(
        np.stack([gx, gy, 128 + 100 * np.sin(gx / 40) * np.cos(gy / 40)], axis=2),
        0, 255,
    ).astype(np.uint8)

    for kwargs, tol in [
        (dict(quality=95), 8),
        (dict(quality=75), 20),
        (dict(quality=95, subsample=True), 24),
        (dict(quality=95, restart_interval=3), 8),
    ]:
        out = decode_jpeg(encode_jpeg(img, **kwargs))
        assert out is not None and out.shape == img.shape, kwargs
        err = np.abs(out.astype(float) - img.astype(float))
        assert err.max() <= tol, (kwargs, err.max())

    # restart variant must be bit-identical in decoded pixels to the
    # non-restart encode at the same quality (same coefficients)
    a = decode_jpeg(encode_jpeg(img, quality=95))
    b = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=3))
    assert np.array_equal(a, b)

    gray = np.clip(gx * 0.6 + gy * 0.4, 0, 255).astype(np.uint8)
    gout = decode_jpeg(encode_jpeg(gray, quality=90))
    assert gout.shape == gray.shape
    assert np.abs(gout.astype(float) - gray.astype(float)).max() <= 10

    # non-multiple-of-8 and tiny sizes
    tiny = np.full((3, 5, 3), 77, dtype=np.uint8)
    tout = decode_jpeg(encode_jpeg(tiny, quality=95))
    assert tout.shape == (3, 5, 3)
    assert np.abs(tout.astype(float) - 77.0).max() <= 4

    assert decode_jpeg(b"nope") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None
    truncated = encode_jpeg(img)[:100]
    assert decode_jpeg(truncated) is None


def test_jpeg_payloads_decode_in_feature_pipeline(spark):
    """synth_media's odd image rows now carry entropy-coded JPEGs; the
    feature UDF decodes them for real (pooled features reflect the
    encoded gradient, not byte noise)."""
    import numpy as np

    from tokenkit_spark.ops.jpeg import decode_jpeg
    from tokenkit_spark.ops.multimodal import synth_media, synth_media_dims

    media = synth_media(spark, n=12)
    jpeg_rows = [
        r for r in media.collect() if r.kind == "image" and r.media_id % 2 == 1
    ]
    assert jpeg_rows
    for r in jpeg_rows:
        img = decode_jpeg(bytes(r.payload))
        w, h = synth_media_dims(r.media_id)
        assert img is not None and img.shape == (h, w, 3)
        # the encoded red channel is a 0..255 horizontal gradient
        red = img[:, :, 0].astype(float)
        assert abs(red[:, 0].mean() - 0) < 12 and abs(red[:, -1].mean() - 255) < 12


def test_resize_images_decode_resize_reencode(spark):
    """decode -> bilinear resize -> PNG re-encode: constant images stay
    constant, gradients keep their endpoints, output round-trips
    through decode_png, non-images yield NULLs."""
    import numpy as np

    from tokenkit_spark.ops.multimodal import (
        decode_png, make_jpeg, make_png, resize_images,
    )

    const = np.full((32, 24, 3), 200, dtype=np.uint8)
    gx, gy = np.meshgrid(np.linspace(0, 255, 48), np.linspace(0, 255, 40))
    grad = np.clip(np.stack([gx, gy, gx], axis=2), 0, 255).astype(np.uint8)
    rows = [
        (0, "image", bytearray(make_png(24, 32, pixels=const)), None, None, None, None),
        (1, "image", bytearray(make_jpeg(48, 40, pixels=grad, quality=95)), None, None, None, None),
        (2, "video", bytearray(b"\x00opaque"), None, None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, "
        "sample_rate int, n_frames int",
    )
    got = {r.media_id: r for r in resize_images(media, 16, 12).collect()}
    assert (got[0].src_w, got[0].src_h, got[0].out_w, got[0].out_h) == (24, 32, 16, 12)
    r0 = decode_png(bytes(got[0].resized))
    assert r0.shape == (12, 16, 3) and np.all(r0 == 200)
    assert got[0].mean_px == 200.0
    r1 = decode_png(bytes(got[1].resized))
    assert r1.shape == (12, 16, 3)
    red = r1[:, :, 0].astype(float)
    assert red[:, 0].mean() < 30 and red[:, -1].mean() > 225  # gradient kept
    assert got[2].src_w is None and got[2].resized is None


def test_build_training_mix_stage_order(spark):
    """Pipeline invariants: exact dups and non-English docs are gone
    BEFORE the LM trains (CCNet ordering), so bigrams that only existed
    in filtered docs score at the smoothed floor; sampling decisions
    ride along as a kept flag."""
    from tokenkit_spark.ops.pipeline import build_training_mix

    en_a = "the cat and the dog sat on the mat with the cat"
    en_b = "zebra quantum flux is on the mat"  # bigram 'zebra quantum' seen ONLY here + in the filtered es doc
    es = "el perro zebra quantum es de la casa y el gato es de la casa"
    rows = [
        (0, en_a, "web"),
        (1, en_a, "web"),      # exact dup -> removed (canon keeps 0)
        (2, en_b, "web"),
        (3, es, "web"),        # lang-filtered before LM training
        (4, en_a, "other"),    # different text? no — same text: would dedup with 0!
    ]
    rows[4] = (4, en_a + " again", "other")
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r
        for r in build_training_mix(
            docs, {"web": 1.0}, langs=("en",), min_quality=0.0, min_tokens=2
        ).collect()
    }
    assert set(out) == {0, 2, 4}  # dup 1 and es 3 removed
    # the LM is trained on the SURVIVORS: ppl equals a survivor-trained
    # model exactly, and differs from one trained on the raw corpus
    # (which would include the filtered es doc's bigrams and vocab)
    from tokenkit_spark.ops.pipeline import clean_corpus
    from tokenkit_spark.ops.textstats import bigram_lm_perplexity

    kept = clean_corpus(docs, langs=("en",), min_quality=0.0, min_tokens=2)
    surv = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    surv_ppl = {r.doc_id: r.ppl for r in bigram_lm_perplexity(surv).collect()}
    assert {k: v.ppl for k, v in out.items()} == surv_ppl
    raw_ppl = {
        r.doc_id: r.ppl
        for r in bigram_lm_perplexity(surv, model_docs=docs).collect()
    }
    assert any(surv_ppl[k] != raw_ppl[k] for k in surv_ppl)
    # rate 1.0 for 'web' keeps those rows; 'other' has rate 0 -> kept=False
    assert out[0].kept is True and out[2].kept is True and out[4].kept is False


def test_quantize_embeddings_roundtrip(spark):
    """Int8 quantization: values within one scale step, zero vectors
    dropped, qvec bounded by [-127, 127], and the quantized top-k
    recalls the fp top-k."""
    import numpy as np
    from pyspark.sql import Row

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 16)).astype(np.float64)
    rows = [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(50)]
    rows.append(Row(vec_id=99, embedding=[0.0] * 16))
    emb = spark.createDataFrame(rows)

    qz = {r.vec_id: r for r in similarity.quantize_embeddings(emb).collect()}
    assert 99 not in qz  # zero vector dropped
    for vid, r in qz.items():
        q = np.array(r.qvec)
        assert q.min() >= -127 and q.max() <= 127
        recon = q * r.scale
        assert np.max(np.abs(recon - vecs[vid])) <= r.scale / 2 + 1e-12

    exact = [r.vec_id for r in similarity.cosine_topk(emb, [float(x) for x in vecs[0]], k=10).collect()]
    quant = [r.vec_id for r in similarity.quantized_cosine_topk(emb, query_id=0, k=10).collect()]
    assert len(set(exact) & set(quant)) >= 8  # >= 0.8 recall at int8
    assert quant[0] == 0  # self-match survives quantization

    import pytest as _pytest
    with _pytest.raises(ValueError):
        similarity.quantized_cosine_topk(emb, query_id=12345)


def test_exact_k_sample_counts_and_determinism(spark):
    from pyspark.sql import Row

    from tokenkit_spark.ops import sampling

    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(40)]
    rows += [Row(doc_id=100 + i, source="tiny") for i in range(2)]  # |stratum| < k
    df = spark.createDataFrame(rows)
    out = sampling.exact_k_sample(df, k=5, salt="x").collect()
    by = {}
    for r in out:
        by.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 5 for s, v in by.items() if s != "tiny")
    assert len(by["tiny"]) == 2  # undersupplied stratum keeps everything
    again = sampling.exact_k_sample(df.repartition(13), k=5, salt="x").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # different salt -> different (deterministic) selection
    other = sampling.exact_k_sample(df, k=5, salt="y").collect()
    assert {r.doc_id for r in other} != {r.doc_id for r in out}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampling.exact_k_sample(df, k=0)


def test_jpeg_fast_loop_entropy_parity(monkeypatch):
    """The fused-window entropy decode (default) and the bit-at-a-time
    oracle path (TOKENKIT_JPEG_FAST=0) must produce bit-identical
    pixels on every supported stream shape — color/gray, 4:2:0,
    restart markers, dense noise and smooth gradients — and agree that
    malformed streams are None."""
    import numpy as np

    from tokenkit_spark.ops.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(23)
    noise = rng.integers(0, 256, size=(48, 72, 3), dtype=np.uint8)
    gx = np.tile(np.arange(120, dtype=np.uint8), (40, 1))
    smooth = np.stack([gx, gx[:, ::-1], np.full_like(gx, 99)], axis=2)
    gray = rng.integers(0, 256, size=(29, 33), dtype=np.uint8)
    streams = [
        encode_jpeg(noise, quality=85),
        encode_jpeg(noise, quality=40),
        encode_jpeg(smooth, quality=90),
        encode_jpeg(smooth, quality=90, subsample=True),
        encode_jpeg(noise, quality=80, restart_interval=2),
        encode_jpeg(gray, quality=75),
        b"\xff\xd8",
        encode_jpeg(noise)[:120],
    ]
    for i, s in enumerate(streams):
        monkeypatch.setenv("TOKENKIT_JPEG_FAST", "0")
        a = decode_jpeg(bytes(s))
        monkeypatch.setenv("TOKENKIT_JPEG_FAST", "1")
        b = decode_jpeg(bytes(s))
        if a is None or b is None:
            assert a is None and b is None, i
        else:
            assert np.array_equal(a, b), i


def test_jpeg_progressive_round_trip():
    """Progressive JPEG (SOF2, spectral selection + successive
    approximation, T.81 Annex G): the progressive encoder produces the
    SAME quantized coefficients as the baseline encoder, so decoding
    its stream must be bit-identical to decoding the baseline stream —
    this exercises every progressive path (DC first/refine interleaved,
    AC first with EOB runs and ZRL, AC refinement with correction
    bits) end to end."""
    import numpy as np

    from tokenkit_spark.ops.jpeg import (
        decode_jpeg,
        decode_status,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    gx = np.tile(np.arange(120, dtype=np.uint8), (40, 1))
    images = [
        rng.integers(0, 256, size=(48, 72, 3), dtype=np.uint8),  # dense AC
        np.stack([gx, gx[:, ::-1], np.full_like(gx, 99)], axis=2),  # EOB runs
        rng.integers(0, 256, size=(29, 33), dtype=np.uint8),  # gray
        np.full((3, 5, 3), 77, dtype=np.uint8),  # tiny, non-multiple-of-8
    ]
    for i, img in enumerate(images):
        for q in (40, 85):
            prog = encode_jpeg_progressive(img, quality=q)
            assert decode_status(bytes(prog)) == "progressive"
            a = decode_jpeg(encode_jpeg(img, quality=q))
            b = decode_jpeg(bytes(prog))
            assert b is not None and np.array_equal(a, b), (i, q)

    # a progressive stream is decodable after ANY whole-scan prefix:
    # cut before the last refinement scans, append EOI -> still decodes
    # (coarser, not None), and full-precision output differs from it
    full = encode_jpeg_progressive(images[0], quality=85)
    sos_positions = [
        j for j in range(2, len(full) - 1)
        if full[j] == 0xFF and full[j + 1] == 0xDA
    ]
    assert len(sos_positions) >= 6
    partial = bytes(full[: sos_positions[3]]) + b"\xff\xd9"
    coarse = decode_jpeg(partial)
    fine = decode_jpeg(bytes(full))
    assert coarse is not None and coarse.shape == fine.shape
    assert not np.array_equal(coarse, fine)

    # truncation MID-scan is malformed
    assert decode_jpeg(bytes(full[: sos_positions[1] + 40])) is None


def test_jpeg_cmyk_ycck_round_trip():
    """4-component Adobe JPEG: CMYK (transform 0) and YCCK (transform
    2) streams decode to the analytic RGB composite within quant
    error; 4 components WITHOUT an Adobe APP14 marker are an ambiguous
    color space — decode refuses (None) and decode_status says
    'unsupported_color'; fast/loop entropy paths stay bit-identical."""
    import numpy as np

    from tokenkit_spark.ops import jpeg

    gx, gy = np.meshgrid(np.linspace(0, 200, 48), np.linspace(0, 200, 40))
    cmyk = np.stack([gx, gy, 200 - gx, 60 + gx * 0.2], axis=2).astype(np.uint8)

    stored = 255.0 - cmyk.astype(np.float64)
    expected = np.clip(np.round(np.stack(
        [stored[..., i] * stored[..., 3] for i in range(3)], axis=2
    ) / 255.0), 0, 255)

    outs = {}
    for ycck in (False, True):
        data = jpeg.encode_jpeg_cmyk(cmyk, quality=95, ycck=ycck)
        assert jpeg.decode_status(bytes(data)) == "baseline"
        out = jpeg.decode_jpeg(bytes(data))
        assert out is not None and out.shape == (40, 48, 3)
        assert np.abs(out.astype(float) - expected).max() <= 4, ycck
        outs[ycck] = out
    # the two transforms encode the same image: small matrix rounding only
    assert np.abs(outs[False].astype(int) - outs[True].astype(int)).max() <= 4

    data = jpeg.encode_jpeg_cmyk(cmyk, quality=95)
    seg_len = int.from_bytes(data[4:6], "big")
    stripped = data[:2] + data[4 + seg_len:]  # drop APP14
    assert jpeg.decode_jpeg(stripped) is None
    assert jpeg.decode_status(stripped) == "unsupported_color"

    rng = np.random.default_rng(41)
    noise = rng.integers(0, 256, size=(24, 40, 4), dtype=np.uint8)
    data = bytes(jpeg.encode_jpeg_cmyk(noise, quality=70, ycck=True))
    import os
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


def test_jpeg_progressive_restart_intervals():
    """Progressive scans with DRI/RSTn markers: DC predictors and EOB
    runs reset at every restart in EVERY scan type (first + refine),
    and the decode stays bit-identical to the baseline decode —
    including ri=1, a restart after every single MCU."""
    import numpy as np

    from tokenkit_spark.ops.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(43)
    for px in (
        rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(24, 40), dtype=np.uint8),
        np.stack([np.tile(np.arange(48, dtype=np.uint8) * 5, (32, 1))] * 3,
                 axis=2),
    ):
        base = decode_jpeg(encode_jpeg(px, quality=80))
        for ri in (1, 3):
            prog = decode_jpeg(
                bytes(encode_jpeg_progressive(px, quality=80,
                                              restart_interval=ri))
            )
            assert prog is not None and np.array_equal(base, prog), ri


def test_gif_decode_roundtrip_and_lzw():
    """Real GIF codec: make_gif -> decode_gif round-trips EXACTLY
    (lossless LZW over an exact palette), plain and interlaced, gray
    and 256-color (code-size growth + table resets); header-only,
    truncated and garbage payloads return None; the feature pipeline
    pools real GIF pixels."""
    import numpy as np

    from tokenkit_spark.ops import multimodal as mm

    rng = np.random.default_rng(19)
    pal = rng.integers(0, 256, size=(12, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 12, size=(37, 53))]
    for interlace in (False, True):
        out = mm.decode_gif(mm.make_gif(53, 37, pixels=px, interlace=interlace))
        assert out is not None and np.array_equal(out, px), interlace

    gray = (np.arange(40 * 24).reshape(24, 40) % 200).astype(np.uint8)
    out = mm.decode_gif(mm.make_gif(40, 24, pixels=gray))
    assert np.array_equal(out, np.stack([gray] * 3, axis=2))

    pal256 = np.array(
        [[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)],
        dtype=np.uint8,
    )
    px = pal256[rng.integers(0, 256, size=(64, 96), dtype=np.uint8)]
    g = mm.make_gif(96, 64, pixels=px)
    assert np.array_equal(mm.decode_gif(g), px)
    assert mm.parse_image_header(g) == ("gif", 96, 64)

    assert mm.decode_gif(mm.make_gif(8, 8)) is None  # header-only
    assert mm.decode_gif(g[: len(g) // 2]) is None
    assert mm.decode_gif(b"nope") is None


def test_png_adam7_and_palette():
    """Adam7-interlaced and palette-indexed (color type 3) PNGs decode
    exactly — previously the interlace flag was IGNORED, which would
    have silently mis-decoded every interlaced web PNG into garbage
    pixels feeding phash/features. Covers edge sizes where whole Adam7
    passes are empty, and the palette+interlace combination."""
    import numpy as np

    from tokenkit_spark.ops import multimodal as mm

    rng = np.random.default_rng(47)
    rgb = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(23, 31), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(12, 3), dtype=np.uint8)
    palimg = pal[rng.integers(0, 12, size=(29, 41))]

    assert np.array_equal(
        mm.decode_png(mm.make_png(53, 37, pixels=rgb, interlace=True)), rgb
    )
    assert np.array_equal(
        mm.decode_png(mm.make_png(31, 23, pixels=gray, interlace=True)), gray
    )
    assert np.array_equal(
        mm.decode_png(mm.make_png(41, 29, pixels=palimg, palette=True)), palimg
    )
    assert np.array_equal(
        mm.decode_png(
            mm.make_png(41, 29, pixels=palimg, palette=True, interlace=True)
        ),
        palimg,
    )
    for h, w in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 1), (1, 9)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(
            mm.decode_png(mm.make_png(w, h, pixels=px, interlace=True)), px
        ), (h, w)

    # palette PNG without a PLTE chunk is malformed
    g = bytearray(mm.make_png(41, 29, pixels=palimg, palette=True))
    import struct as _s
    pos = 8
    while pos + 8 <= len(g):
        (ln,) = _s.unpack(">I", bytes(g[pos:pos + 4]))
        if bytes(g[pos + 4:pos + 8]) == b"PLTE":
            del g[pos:pos + 12 + ln]
            break
        pos += 12 + ln
    assert mm.decode_png(bytes(g)) is None


def test_bmp_decode_roundtrip():
    """Real 24-bit BMP codec: bottom-up and top-down rows, 4-byte row
    padding, BGR order — make_bmp -> decode_bmp round-trips exactly;
    header parse recovers dimensions; header-only/truncated/garbage
    payloads return None."""
    import numpy as np

    from tokenkit_spark.ops import multimodal as mm

    rng = np.random.default_rng(53)
    px = rng.integers(0, 256, size=(23, 37, 3), dtype=np.uint8)
    for top_down in (False, True):
        out = mm.decode_bmp(mm.make_bmp(37, 23, pixels=px, top_down=top_down))
        assert out is not None and np.array_equal(out, px), top_down
    gray = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    assert np.array_equal(
        mm.decode_bmp(mm.make_bmp(13, 9, pixels=gray)),
        np.stack([gray] * 3, axis=2),
    )
    for h, w in [(1, 1), (2, 2), (5, 3)]:  # padding edge sizes
        p = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm.decode_bmp(mm.make_bmp(w, h, pixels=p)), p)
    assert mm.parse_image_header(mm.make_bmp(37, 23)) == ("bmp", 37, 23)
    assert mm.decode_bmp(mm.make_bmp(8, 8)) is None  # header-only
    b = mm.make_bmp(37, 23, pixels=px)
    assert mm.decode_bmp(b[: len(b) // 2]) is None
    assert mm.decode_bmp(b"BMnope") is None
