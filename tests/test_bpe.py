"""Distributed BPE training/encoding vs an independent single-process
reference implementation of the Sennrich et al. 2016 algorithm (coded
here from the paper's description, not shared with ops/bpe.py)."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops import bpe

CORPUS = [
    (0, "low low low low low lower lower newest newest"),
    (1, "newest newest newest newest widest widest widest new"),
    (2, "the lowest newest widest low new news"),
    (3, "low low lower lowest newest widest wide wider"),
]


def ref_train(texts, n_merges, pattern, min_pair_freq=2):
    """Reference trainer: explicit freq-dict algorithm from the paper."""
    rx = re.compile(pattern)
    vocab = Counter()
    for t in texts:
        for w in rx.findall(t):
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        # (freq desc, left asc, right asc) — the pinned tie-break
        (l, r), best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if best < min_pair_freq:
            break
        merges.append((l, r))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def ref_encode(text, merges, pattern):
    rx = re.compile(pattern)
    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    for w in rx.findall(text):
        syms = list(w)
        while len(syms) > 1:
            cands = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cands:
                break
            rank, _ = min(cands)
            l, r = merges[rank]
            nxt, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    nxt.append(l + r)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        out.extend(syms)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


def test_train_matches_reference(spark, docs):
    got = bpe.train_bpe(docs, n_merges=12, checkpoint_every=5)
    want = ref_train(
        [t for _, t in CORPUS], 12, bpe.BPE_PRETOKEN_PATTERN
    )
    assert got == want
    assert len(got) >= 8  # the corpus genuinely supports this many merges


def test_encode_matches_reference(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=10, checkpoint_every=4)
    enc = {r.doc_id: list(r.tokens) for r in bpe.encode_bpe(docs, merges).collect()}
    for doc_id, text in CORPUS:
        assert enc[doc_id] == ref_encode(text, merges, bpe.BPE_PRETOKEN_PATTERN)


def test_encode_roundtrip_reconstructs_text(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=10, checkpoint_every=4)
    enc = bpe.encode_bpe(docs, merges)
    back = {
        r.doc_id: "".join(r.tokens) for r in enc.collect()
    }
    for doc_id, text in CORPUS:
        assert back[doc_id] == text


def test_token_stats_shapes(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=6, checkpoint_every=3)
    rows = bpe.bpe_token_stats(docs, merges).collect()
    assert len(rows) == len(CORPUS)
    for r in rows:
        assert r.n_tokens >= r.n_types > 0
        assert r.chars_per_token > 0


def test_min_pair_freq_stops_training(spark):
    tiny = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    # the only pair occurs once; min_pair_freq=2 must refuse to merge it
    assert bpe.train_bpe(tiny, n_merges=5, min_pair_freq=2) == []


def test_train_paths_identical(spark):
    """Sequential single-merge, batched non-interacting, and the
    driver-finish in-memory trainer must produce the SAME merge table
    — batching is provably order-preserving (maximal non-interacting
    prefix, strict-count trim) and the local trainer mirrors the
    distributed semantics exactly."""
    from tokenkit_spark.ops.bpe import train_bpe

    docs = spark.createDataFrame(
        [
            (0, "low lower lowest newer newest wide widest low low"),
            (1, "new newer news lower low wide wider widest"),
            (2, "lowest newest widest low new wide lowlow"),
        ],
        "doc_id long, text string",
    )
    seq = train_bpe(docs, n_merges=40, max_batch=1,
                    local_finish_cells=0)
    bat = train_bpe(docs, n_merges=40, max_batch=256,
                    local_finish_cells=0)
    loc = train_bpe(docs, n_merges=40)
    assert seq == bat == loc
    assert len(seq) > 5
