"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard. All DataFrame-native except the signature
computations, which are Arrow-batched pandas UDFs (numpy-vectorized).

Designed for the 100 TB regime:
* exact dedup is a single hash-groupBy (partial agg flattens skew);
* MinHash/LSH emits (band, bucket) keys and joins WITHIN buckets only —
  never an all-pairs product; bucket population is bounded by banding;
* SimHash groups by 16-bit prefix bands for Hamming candidate generation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1


def normalize_url(url_col) -> "F.Column":
    """Canonical URL form for crawl dedup — pure Catalyst expressions:

    * scheme + host lowercased; ``www.`` prefix dropped
    * default ports ``:80`` / ``:443`` stripped
    * fragment (``#...``) stripped
    * tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``) removed,
      remaining query params kept in original order; ``?`` dropped if none
    * trailing ``/`` trimmed (but a bare host keeps none anyway)

    Standard Common-Crawl practice: ~10-20%% of crawl URLs are duplicate
    pages reachable through tracking-decorated or www/non-www variants.
    """
    c = url_col if not isinstance(url_col, str) else F.col(url_col)
    no_frag = F.regexp_replace(c, r"#.*$", "")
    # split off query, normalize the authority+path part
    base = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    scheme_host = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    rest = F.regexp_extract(base, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1)
    base = F.when(
        scheme_host != "", F.concat(F.lower(scheme_host), rest)
    ).otherwise(base)  # scheme-less input: leave case/structure alone
    base = F.regexp_replace(base, r"^(https?://)www\.", r"$1")
    base = F.regexp_replace(base, r"^(https?://[^/:]+):(?:80|443)(/|$)", r"$1$2")
    base = F.regexp_replace(base, r"/+$", "")
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="),
    )
    return F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)


def url_duplicates(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Groups of pages whose URLs canonicalize to the same target:
    (canonical_url, dup_count, min_url). Hash-groupBy — scales like
    exact_duplicates."""
    return (
        pages.groupBy(normalize_url(url_col).alias("canonical_url"))
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(url_col).alias("min_url"))
        .filter(F.col("dup_count") > 1)
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: (text_hash, dup_count, min_doc_id),
    duplicates only. md5 keeps the oracle (DuckDB) twin trivial."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("dup_count") > 1)
    )


def _minhash_params(num_perm: int, seed: int = 7):
    """Per-permutation multipliers/offsets for h_i(x) = a_i*x + b_i mod
    2^64. With a_i forced ODD the map is a bijection of the 64-bit space
    — a true permutation (what MinHash wants) — and the natural uint64
    wrap replaces the old `% (2^61-1)` reduction, whose integer division
    dominated the signature kernel (~10x the multiply cost)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_FNV_PRIME = np.uint64(1099511628211)
_FNV_BASIS = np.uint64(14695981039346656037)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct char-k shingle hashes of ``text`` with NO per-shingle
    Python loop: sliding_window_view over the utf-8 byte array + an
    FNV-1a-style polynomial hash vectorized across all shingles (k — not
    n_shingles — iterations of whole-array ops). uint64 arithmetic wraps
    mod 2^64, which is exactly FNV's contract, so the hash is
    deterministic across executor processes."""
    t = text.lower().encode("utf-8", "ignore")
    if len(t) < k:
        t = t.ljust(k, b"\0")  # one (padded) shingle, like the short-doc case
    arr = np.frombuffer(t, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, k)
    h = np.full(win.shape[0], _FNV_BASIS, dtype=np.uint64)
    for j in range(k):
        h = (h ^ win[:, j].astype(np.uint64)) * _FNV_PRIME
    return np.unique(h)


def minhash_udf(num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
    """text -> array<long> MinHash signature over char-k shingles.
    Vectorized end-to-end: shingle hashing is numpy sliding-window FNV
    (no per-shingle Python), and the permutation min-reduce is one
    (num_shingles x num_perm) matrix op per doc."""
    a, b = _minhash_params(num_perm, seed)

    def _sig(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(text):
            if text is None:
                return None
            x = _shingle_hashes(text, shingle_k)
            # h_i(x) = a_i*x + b_i mod 2^64 (a_i odd => bijection),
            # minimized over shingles; pure wrap arithmetic, no division
            hv = x[:, None] * a[None, :] + b[None, :]
            return hv.min(axis=0).astype(np.int64).tolist()

        for series in batch_iter:
            yield series.map(one)

    return F.pandas_udf(_sig, ArrayType(LongType()))


def minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any MinHash band bucket.
    Returns (doc_id_a, doc_id_b, n_shared_bands), a < b."""
    rows_per_band = num_perm // bands
    sig = docs.select(
        "doc_id", minhash_udf(num_perm, shingle_k)(F.col(text_col)).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_id_a"), F.col("r.doc_id").alias("doc_id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash_udf(seed: int = 11):
    """text -> 64-bit SimHash over whitespace tokens (weighted by tf).

    Vectorized across the WHOLE Arrow batch: every token of every doc in
    the batch is hashed in ONE ``pd.util.hash_array`` call (SipHash in C,
    deterministic for a fixed hash_key — unlike Python's salted hash()),
    then per-doc bit voting is numpy slicing. No per-token Python."""
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    bit_idx = np.arange(64, dtype=np.uint64)

    def _sig(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def batch(series: pd.Series) -> pd.Series:
            tok_lists = [
                t.lower().split() if t is not None else None for t in series
            ]
            flat = [tok for tl in tok_lists if tl for tok in tl]
            nonempty = [tl for tl in tok_lists if tl]
            sigs = np.zeros(0, dtype=np.int64)
            if flat:
                hs = pd.util.hash_array(
                    np.asarray(flat, dtype=object), categorize=False
                ) ^ seed_mix
                # bit expansion via unpackbits (LUT in C — far cheaper
                # than a broadcast uint64 shift matrix), per-doc per-bit
                # one-counts via ONE reduceat over the batch; float32
                # accumulation is exact for counts < 2^24 tokens/doc and
                # benches ~4x faster than int32 here
                bits = np.unpackbits(
                    hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                ).astype(np.float32)
                lens = np.array([len(tl) for tl in nonempty], dtype=np.int64)
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                ones = np.add.reduceat(bits, starts, axis=0)
                # majority vote: bit j set iff sum(+-1) > 0 iff 2*ones > n
                pos = (2 * ones > lens[:, None]).astype(np.uint64)
                sigs = (pos << bit_idx[None, :]).sum(axis=1, dtype=np.uint64).astype(np.int64)
            out, di = [], 0
            for tl in tok_lists:
                if tl is None:
                    out.append(None)
                elif not tl:
                    out.append(0)
                else:
                    out.append(int(sigs[di]))
                    di += 1
            return pd.Series(out, dtype=object)

        for series in batch_iter:
            yield batch(series)

    return F.pandas_udf(_sig, LongType())


def simhash_candidates(docs: DataFrame, text_col: str = "text", prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates: equal SimHash prefix band (4 rotations cover
    Hamming distance <= 3 in at least one band for 64-bit hashes)."""
    sig = docs.select("doc_id", simhash_udf()(F.col(text_col)).alias("sim"))
    shift = 64 - prefix_bits
    bands = sig.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rot"),
                        F.shiftrightunsigned(
                            F.expr(
                                f"shiftleft(sim, {16 * r}) | shiftrightunsigned(sim, {64 - 16 * r})"
                            )
                            if r
                            else F.col("sim"),
                            shift,
                        ).alias("band"),
                    )
                    for r in range(4)
                ]
            )
        ).alias("rb"),
    ).select("doc_id", "sim", F.col("rb.rot").alias("rot"), F.col("rb.band").alias("band"))
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.rot") == F.col("r.rot"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_a"),
            F.col("r.doc_id").alias("doc_id_b"),
            F.col("l.sim").alias("sim_a"),
            F.col("r.sim").alias("sim_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).drop("sim_a", "sim_b")


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_gram_df: int | None = 10_000,
) -> DataFrame:
    """Word-n-gram Jaccard similarity for near-dup verification.
    All-DataFrame: explode n-grams, self-join on shared grams (inverted-
    index join, not cross product), |A∩B| via count, |A∪B| via sizes.

    ``max_gram_df``: at web scale the self-join goes quadratic inside any
    high-df gram group (a boilerplate trigram shared by 10^5 docs means
    10^10 candidate rows). Setting a cap drops grams whose document
    frequency exceeds it BEFORE the join — sizes and intersections are
    then both computed over the reduced gram space, so the result is the
    exact Jaccard over sub-cap grams (standard boilerplate-suppression:
    pairs whose only overlap is ubiquitous grams correctly fall away;
    pairs carried by discriminative grams are unaffected). The default is
    a finite cap (10_000) so the quadratic path can never detonate by
    omission; pass ``max_gram_df=None`` explicitly for exact Jaccard over
    all grams (the DuckDB-oracle twin; small corpora only)."""
    grams = _word_gram_relation(docs, text_col, n, max_gram_df)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    l, r = grams.alias("l"), grams.alias("r")
    inter = (
        l.join(r, (F.col("l.gram") == F.col("r.gram")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("doc_id_a"), F.col("r.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_grams").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_grams").alias("size_b"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def _word_gram_relation(
    docs: DataFrame, text_col: str, n: int, max_gram_df: int | None
) -> DataFrame:
    """(doc_id, gram) with grams distinct per doc, lowercase-whitespace
    word n-grams, optionally stripped of head grams whose document
    frequency exceeds ``max_gram_df`` (the quadratic-join fuse shared by
    the Jaccard and containment paths)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    gram_list = F.when(
        n_words >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_words - n + 1),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", F.explode(gram_list).alias("gram"))
    if max_gram_df is not None:
        # grams are distinct per doc, so count(*) per gram IS its df;
        # anti-join strips the head grams before the quadratic join
        hot = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_gram_df)
            .select("gram")
        )
        grams = grams.join(hot, "gram", "left_anti")
    return grams


def ngram_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_gram_df: int | None = 10_000,
) -> DataFrame:
    """Word-n-gram CONTAINMENT near-dup pairs — Broder's second
    resemblance measure ("On the resemblance and containment of
    documents", SEQUENCES 1997): C(A,B) = |A∩B| / |A|. Containment is
    what Jaccard structurally misses when sizes differ: a short page
    quoted whole inside a long one has tiny Jaccard (union is dominated
    by the long doc) but containment ≈ 1.0 from the short side — the
    mirror/quotation/template-expansion case that matters in web-crawl
    dedup, where J >= t implies both containments >= t but not back.

    Same inverted-index-join shape (and the same ``max_gram_df``
    quadratic fuse) as ngram_jaccard_pairs; a pair survives when
    max(C(A,B), C(B,A)) >= threshold, and both directions are returned
    so the caller can tell subset-of from rough-equality. Returns
    (doc_id_a, doc_id_b, inter, size_a, size_b, containment_a,
    containment_b) with doc_id_a < doc_id_b."""
    grams = _word_gram_relation(docs, text_col, n, max_gram_df)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    l, r = grams.alias("l"), grams.alias("r")
    inter = (
        l.join(r, (F.col("l.gram") == F.col("r.gram")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("doc_id_a"), F.col("r.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_grams").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_grams").alias("size_b"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn("containment_a", F.col("inter") / F.col("size_a"))
        .withColumn("containment_b", F.col("inter") / F.col("size_b"))
        .filter(
            F.greatest("containment_a", "containment_b") >= F.lit(threshold)
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            "inter",
            "size_a",
            "size_b",
            "containment_a",
            "containment_b",
        )
    )


# --- distributed Bloom-filter membership (the 100 TB recrawl primitive) ---


def _bloom_pos_exprs(key_col, n_bits: int, n_hashes: int) -> list:
    """k bit positions per key: md5(key || ':' || i) first-8-hex mod
    n_bits. md5 is bit-identical in every engine (Spark conv / DuckDB
    hex cast), which makes the whole filter SQL-oracle-checkable —
    swap xxhash64 seeds for raw speed when that's not needed."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(key_col, F.lit(f":{i}"))), 1, 8), 16, 10
        ).cast("long")
        % n_bits
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter RELATIONALLY: each key sets ``n_hashes``
    bits; bits pack into 32-bit words (32 keeps every shift < 2^32 — portable
    to engines that range-check BIGINT shifts) and the filter is the sparse
    (word_idx, word) table — ``bit_or`` hash-aggregate, bounded by
    ``n_bits/32`` rows regardless of corpus size.

    Scale shape: this is the membership sketch for cross-crawl dedup —
    10^11 seen-URL keys reduce to a <= (n_bits/32)-row table that
    BROADCASTS into any probe join. Map-side partial bit_or means the
    shuffle carries at most n_words rows per task. No driver state."""
    pos = keys.select(
        F.explode(F.array(*_bloom_pos_exprs(F.col(key_col), n_bits, n_hashes))).alias(
            "p"
        )
    )
    return (
        pos.select(
            (F.col("p") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    id_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Probe the filter: a candidate is ``maybe_seen`` iff ALL its
    ``n_hashes`` bits are set (no false negatives; false-positive rate
    set by n_bits/n_hashes vs build cardinality). The word table
    broadcasts; the probe is one equi-join + hash agg over
    (id, word_idx) — map-side at any candidate count."""
    pos = candidates.select(
        F.col(id_col),
        F.posexplode(
            F.array(*_bloom_pos_exprs(F.col(key_col), n_bits, n_hashes))
        ).alias("i", "p"),
    ).select(
        id_col,
        "i",
        (F.col("p") / 32).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias("mask"),
    )
    hit = (
        pos.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            F.col("word").isNotNull()
            & (F.col("word").bitwiseAND(F.col("mask")) == F.col("mask")),
        )
        .groupBy(id_col)
        .agg((F.min(F.col("hit").cast("int")) == 1).alias("maybe_seen"))
    )
    return candidates.join(hit, id_col)


def bloom_dedup_stats(
    seen_docs: DataFrame,
    new_docs: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """End-to-end Bloom recrawl dedup with its own audit: build the
    filter from ``seen_docs`` keys, probe every ``new_docs`` key, and
    join against EXACT membership (the distinct seen-key set) to split
    probe hits into true dups vs false positives. One summary row:
    (n_new, n_maybe_seen, n_true_dup, n_false_pos, fp_rate) — the
    no-false-negatives invariant is checkable as
    n_true_dup == exact dup count.

    The exact-membership join is the audit path (it's what the Bloom
    filter exists to avoid at scale); production keeps only the
    build + probe legs."""
    bloom = bloom_build(seen_docs.select(key_col), key_col, n_bits, n_hashes)
    probed = bloom_probe(
        new_docs.select(id_col, key_col), bloom, key_col, id_col, n_bits, n_hashes
    )
    seen_keys = seen_docs.select(F.col(key_col).alias("__seen_key")).distinct()
    audited = probed.join(
        seen_keys, probed[key_col] == F.col("__seen_key"), "left"
    ).select(
        "maybe_seen", F.col("__seen_key").isNotNull().alias("is_dup")
    )
    return audited.agg(
        F.count(F.lit(1)).alias("n_new"),
        F.sum(F.col("maybe_seen").cast("long")).alias("n_maybe_seen"),
        F.sum(F.col("is_dup").cast("long")).alias("n_true_dup"),
        F.sum((F.col("maybe_seen") & ~F.col("is_dup")).cast("long")).alias(
            "n_false_pos"
        ),
        F.round(
            F.sum((F.col("maybe_seen") & ~F.col("is_dup")).cast("double"))
            / F.count(F.lit(1)),
            6,
        ).alias("fp_rate"),
    )


def snapshot_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-snapshot incremental dedup (the CommonCrawl recrawl shape):
    drop any new-snapshot doc whose content hash already sits in the
    persisted ``seen_hashes(content_hash)`` store, then collapse dups
    WITHIN the new snapshot to the lowest id. Returns the surviving
    docs + their content_hash — append it to the store for the next
    snapshot.

    Scale shape: one left-anti join against the store (hash-partitioned
    equi-join, AQE-broadcastable when the store is small) + one
    min-id-per-hash hash agg. The store never loads into the driver;
    md5 keeps the hash engine-portable (swap xxhash64 at scale)."""
    hashed = new_docs.withColumn("content_hash", F.md5(F.col(text_col)))
    fresh = hashed.join(seen_hashes, "content_hash", "left_anti")
    w_min = fresh.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return fresh.join(w_min, ["content_hash", id_col]).select(
        id_col, "content_hash"
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph-level dedup (the C4/Dolma cleaning step):
    every paragraph is kept only at its FIRST occurrence in the corpus
    order (doc_id, then position within doc) — repeated boilerplate
    (newsletter plugs, copyright footers) vanishes from every later
    doc, and a paragraph repeated inside one doc keeps only its first
    instance.

    Skew-safe shape: first-occurrence is computed as a min(struct(doc,
    idx)) HASH AGGREGATE per paragraph hash — map-side partials absorb
    the 10^9-doc boilerplate paragraph that would melt a window
    partition — then one h-keyed join flags survivors. Paragraphs group
    by xxhash64; the reassembled text, not the hash, is the output
    contract. Returns (doc_id, text_dedup, n_kept, n_removed)."""
    paras = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "para"),
    ).filter(F.trim(F.col("para")) != "")
    hashed = paras.withColumn("h", F.xxhash64("para"))
    firsts = hashed.groupBy("h").agg(
        F.min(F.struct(id_col, "idx")).alias("first")
    )
    flagged = hashed.join(firsts, "h").withColumn(
        "keep",
        (F.col(id_col) == F.col("first")[id_col])
        & (F.col("idx") == F.col("first.idx")),
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("idx", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_dedup"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aho,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm). Text is normalized (lowercase, runs of
    whitespace collapsed to one space), hashed per character ``k``-gram,
    and from every window of ``w`` consecutive hashes the minimum is
    selected; the fingerprint is the distinct set of selected hashes.
    Winnowing guarantees any shared substring of length >= k + w - 1
    contributes at least one shared fingerprint — detection is
    position-free and robust to reordering, unlike whole-doc hashes.

    The k-gram hash is the first 8 hex digits of md5 — engine-
    independent, so a DuckDB oracle replays the exact selection (the
    same trick as ops/sampling.py). Everything is per-row Catalyst
    array lambdas: no shuffle, no UDF, no state — the fingerprint step
    is embarrassingly parallel at any corpus size. Docs shorter than
    ``k`` normalized chars are dropped (no gram exists).

    Returns (id_col, fingerprints:array<bigint>, n_fp:int).
    """
    if k < 2 or w < 1:
        raise ValueError("winnow_fingerprints: need k >= 2 and w >= 1")
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    d = docs.select(id_col, norm.alias("__norm")).filter(
        F.length("__norm") >= k
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.length("__norm") - F.lit(k - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.col("__norm").substr(i, F.lit(k))), 1, 8),
            16,
            10,
        ).cast("long"),
    )
    d = d.select(id_col, hashes.alias("__h"))
    # one min per window of w consecutive hashes; a doc with fewer than w
    # grams contributes the min of what it has (slice is length-tolerant)
    mins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.lit(1), F.size("__h") - F.lit(w - 1))
        ),
        lambda j: F.array_min(F.slice(F.col("__h"), j, w)),
    )
    return d.select(
        id_col,
        F.array_sort(F.array_distinct(mins)).alias("fingerprints"),
    ).withColumn("n_fp", F.size("fingerprints"))


def winnow_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    min_overlap: float = 0.0,
    max_hash_df: int | None = 10_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints: docs
    sharing >= ``min_shared`` selected hashes AND an overlap coefficient
    shared / min(n_fp_a, n_fp_b) >= ``min_overlap`` (templated/boiler-
    plate corpora share many k-grams; the coefficient, not the raw
    count, separates near-dups from shared boilerplate).

    Scale shape: explode fingerprints -> equi-join on the hash (never
    all-pairs), aggregate per pair. ``max_hash_df`` drops hashes shared
    by more than that many docs before the self-join — the same
    quadratic-blowup guard as ngram_jaccard_pairs (a boilerplate gram
    shared by 10^5 docs would alone emit 10^10 pair rows); pass None
    for the exact oracle twin at test scale.

    The exploded stream is repartitioned on the hash with an EXPLICIT
    partition count: the join's output is quadratically larger than its
    input, and on a small input AQE would coalesce the pre-join shuffle
    to one partition and run the whole blowup single-threaded (an
    explicit numPartitions is exempt from AQE coalescing). At corpus
    scale the input is large enough that this also pre-spreads hash
    groups evenly.
    """
    fp = winnow_fingerprints(docs, text_col, k, w, id_col)
    n_part = max(docs.sparkSession.sparkContext.defaultParallelism * 4, 32)
    # explode_outer, NOT explode: for a plain explode Spark's
    # InferFiltersFromGenerate adds `size(fingerprints) > 0` below the
    # Generate, and predicate pushdown then inlines the fingerprint
    # expression into that (interpreted) Filter — where the window-min
    # lambda no longer shares the hash array and recomputes ALL k-gram
    # md5s per window: O(len^2) md5 calls per row, a >100x blowup
    # measured at sf0.01. explode_outer infers no such filter; the
    # h-null guard below it cannot be pushed under the Generate.
    ex = fp.select(
        F.col(id_col),
        F.col("n_fp"),
        F.explode_outer("fingerprints").alias("h"),
    ).filter(F.col("h").isNotNull()).repartition(n_part, "h")
    if max_hash_df is not None:
        hot = (
            ex.groupBy("h")
            .agg(F.count(F.lit(1)).alias("hdf"))
            .filter(F.col("hdf") > max_hash_df)
            .select("h")
        )
        ex = ex.join(hot, "h", "left_anti")
    a = ex.select(
        F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_a"), "h"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_b"), "h"
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .filter(
            F.col("shared") / F.least("n_a", "n_b") >= F.lit(float(min_overlap))
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        "shared",
        F.round(
            F.col("shared") / F.least("n_a", "n_b"), 6
        ).alias("overlap"),
    )


def lsh_plan(
    spark,
    num_perm: int = 64,
    threshold: float = 0.8,
    probe_offset: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """MinHash-LSH banding planner (the S-curve analysis of Leskovec,
    Rajaraman & Ullman, "Mining of Massive Datasets" ch. 3): for every
    factorization num_perm = b bands × r rows, the probability that a
    pair with Jaccard similarity s shares at least one band bucket is

        P(s) = 1 - (1 - s^r)^b

    with inflection at s* ≈ (1/b)^(1/r). Emits one row per (b, r) with
    the curve's threshold s*, the catch probability at
    ``threshold + probe_offset`` (1 - that = false-negative rate for
    clear duplicates) and at ``threshold - probe_offset`` (false-
    positive / wasted-verification rate), and ``chosen`` on the
    factorization whose s* lands closest to ``threshold`` — the knob
    minhash_candidates should be run with. Driver-side math on a
    divisor-count-sized relation; nothing scales with the corpus."""
    rows = []
    best = None
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        s_star = (1.0 / b) ** (1.0 / r)
        p_hi = 1.0 - (1.0 - min(threshold + probe_offset, 1.0) ** r) ** b
        p_lo = 1.0 - (1.0 - max(threshold - probe_offset, 0.0) ** r) ** b
        rows.append((b, r, s_star, p_hi, 1.0 - p_hi, p_lo))
        if best is None or abs(s_star - threshold) < abs(best - threshold):
            best = s_star
    out = spark.createDataFrame(
        rows,
        "bands int, rows_per_band int, s_star double, "
        "p_catch_hi double, fn_rate_hi double, fp_rate_lo double",
    )
    return out.select(
        "bands",
        "rows_per_band",
        F.round("s_star", round_digits).alias("s_star"),
        F.round("p_catch_hi", round_digits).alias("p_catch_hi"),
        F.round("fn_rate_hi", round_digits).alias("fn_rate_hi"),
        F.round("fp_rate_lo", round_digits).alias("fp_rate_lo"),
        (F.round("s_star", round_digits) == round(best, round_digits)).alias(
            "chosen"
        ),
    )


def planted_dup_eval(
    docs: DataFrame,
    plant_mod: int = 5,
    drop_every: int = 7,
    id_offset: int = 1_000_000,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Detector-quality harness: recall/precision of the trigram-
    containment near-dup detector on PLANTED perturbed duplicates.

    The standard way to validate a dedup stack before trusting it at
    corpus scale (the protocol behind the SuperMinHash/MinHash recall
    tables and Lee et al.'s dedup evaluations): inject known
    near-duplicates with a DETERMINISTIC perturbation — here every
    ``plant_mod``-th document gets a copy (id + ``id_offset``) with
    every ``drop_every``-th word removed — run the detector on the
    union corpus, and score detected pairs against the planted truth:

        recall    = planted pairs detected / planted pairs
        precision = planted pairs detected / all detected pairs

    Precision < 1 is NOT necessarily a bug — the corpus may contain
    organic near-dups — which is why both numbers ship.  One row:
    (n_planted, n_detected, n_hits, recall, precision).

    Scale shape: the perturbation is a projection; the detector is
    the audited ``ngram_containment_pairs`` itself (same gram-join
    shape); the scoring is two hash joins on pair keys.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    kept = F.filter(
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size(words) - 1, F.lit(0))
            ),
            lambda i: F.when(
                (i < F.size(words)) & ((i + 1) % drop_every != 0),
                F.get(words, i),
            ),
        ),
        lambda w: w.isNotNull(),
    )
    perturbed = docs.filter(F.col(id_col) % plant_mod == 0).select(
        (F.col(id_col) + id_offset).alias(id_col),
        F.array_join(kept, " ").alias(text_col),
    )
    corpus = docs.select(id_col, text_col).unionByName(perturbed)
    detected = ngram_containment_pairs(
        corpus, text_col=text_col, n=n, threshold=threshold,
        max_gram_df=None,
    ).select(
        F.least("doc_id_a", "doc_id_b").alias("a"),
        F.greatest("doc_id_a", "doc_id_b").alias("b"),
    ).distinct()
    planted = docs.filter(F.col(id_col) % plant_mod == 0).select(
        F.col(id_col).alias("a"),
        (F.col(id_col) + id_offset).alias("b"),
    )
    n_planted = planted.count()
    n_detected = detected.count()
    n_hits = detected.join(planted, ["a", "b"]).count()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_planted,
                n_detected,
                n_hits,
                round(n_hits / n_planted, round_digits)
                if n_planted
                else 0.0,
                round(n_hits / n_detected, round_digits)
                if n_detected
                else 0.0,
            )
        ],
        "n_planted long, n_detected long, n_hits long, recall double, "
        "precision double",
    )


def source_overlap_matrix(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Cross-source near-duplicate rate matrix — where does the
    corpus's redundancy live?

    The mix-design view of dedup (the question the CCNet/RefinedWeb
    pipelines answer before weighting sources): near-dup PAIRS
    (trigram containment >= threshold, the ``ngram_containment_pairs``
    detector) rolled up by SOURCE PAIR, normalized by the number of
    cross-pair document combinations — an upper-triangle matrix whose
    diagonal is within-source redundancy and whose off-diagonal
    flags syndication between sources.  A hot off-diagonal cell means
    deduping source A largely dedups B too — double-counted mass the
    mixture weights (``training_mix``, ``source_divergence``) should
    know about.

    Per (source_a <= source_b): (source_a, source_b, n_docs_a,
    n_docs_b, n_dup_pairs, dup_rate_ppm).
    """
    pairs = ngram_containment_pairs(
        docs, text_col=text_col, n=n, threshold=threshold,
        max_gram_df=None,
    ).select("doc_id_a", "doc_id_b")
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(group_col).alias("src")
    )
    tagged = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("src").alias("sa"),
            ),
            "doc_id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("src").alias("sb"),
            ),
            "doc_id_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    cnt = tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_dup_pairs")
    )
    sizes = src.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    out = (
        cnt.join(
            sizes.select(
                F.col("src").alias("source_a"), F.col("n").alias("n_docs_a")
            ),
            "source_a",
        )
        .join(
            sizes.select(
                F.col("src").alias("source_b"), F.col("n").alias("n_docs_b")
            ),
            "source_b",
        )
    )
    n_combos = F.when(
        F.col("source_a") == F.col("source_b"),
        F.col("n_docs_a") * (F.col("n_docs_a") - 1) / 2.0,
    ).otherwise(F.col("n_docs_a") * F.col("n_docs_b").cast("double"))
    return out.select(
        "source_a",
        "source_b",
        "n_docs_a",
        "n_docs_b",
        "n_dup_pairs",
        F.round(
            F.col("n_dup_pairs") / n_combos * 1e6, round_digits
        ).alias("dup_rate_ppm"),
    )


BLOOM_K = 4


def bloom_fpr_audit(
    docs: DataFrame,
    m_bits: int = 4096,
    id_col: str = "doc_id",
    member_mod: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Bloom-filter false-positive-rate audit — measured vs the
    textbook formula, exact bit-level replay.

    Bloom (CACM 1970): insert the member set (doc ids with
    id %% member_mod == 0) into an m-bit filter via k keyed-md5
    hashes; probe with the NON-members and count how many find all k
    bits set.  The audit compares the measured FP rate against the
    classic approximation (1 - e^(-kn/m))^k AND against the exact
    expected rate (1 - (1-1/m)^(kn))^k — at small m the two visibly
    differ, which is the point of measuring.  Everything is keyed
    md5 arithmetic, so the oracle replays the exact same bit sets.

    One row: (m_bits, k, n_members, n_probes, n_false_positive,
    measured_fpr, approx_fpr, exact_fpr).
    """
    import math

    def positions(id_col_expr, i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            id_col_expr.cast("string"),
                            F.lit(f"|bloom{i}|"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )

    members = docs.filter(F.col(id_col) % member_mod == 0).select(
        F.col(id_col).alias("id")
    )
    probes = docs.filter(F.col(id_col) % member_mod != 0).select(
        F.col(id_col).alias("id")
    )
    n_members = members.count()
    n_probes = probes.count()
    bits = None
    for i in range(BLOOM_K):
        b = members.select(positions(F.col("id"), i).alias("bit"))
        bits = b if bits is None else bits.unionByName(b)
    bitset = bits.distinct()
    probe_bits = None
    for i in range(BLOOM_K):
        pb = probes.select(
            "id", positions(F.col("id"), i).alias("bit")
        )
        probe_bits = (
            pb if probe_bits is None else probe_bits.unionByName(pb)
        )
    hits = (
        probe_bits.join(bitset, "bit", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("nset"))
    )
    # all k DISTINCT probe bits set; a probe whose k hashes collide
    # produces < k distinct bits, so count distinct per probe
    distinct_per_probe = probe_bits.groupBy("id").agg(
        F.countDistinct("bit").alias("nbits")
    )
    fp = (
        distinct_per_probe.join(
            probe_bits.join(bitset, "bit", "left_semi")
            .groupBy("id")
            .agg(F.countDistinct("bit").alias("nset")),
            "id",
            "left",
        )
        .na.fill({"nset": 0})
        .filter(F.col("nset") == F.col("nbits"))
        .count()
    )
    kn = BLOOM_K * n_members
    approx = (1.0 - math.exp(-kn / m_bits)) ** BLOOM_K
    exact = (1.0 - (1.0 - 1.0 / m_bits) ** kn) ** BLOOM_K
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                m_bits,
                BLOOM_K,
                n_members,
                n_probes,
                fp,
                round(fp / n_probes, round_digits) if n_probes else 0.0,
                round(approx, round_digits),
                round(exact, round_digits),
            )
        ],
        "m_bits long, k long, n_members long, n_probes long, "
        "n_false_positive long, measured_fpr double, "
        "approx_fpr double, exact_fpr double",
    )


def er_blocking_audit(
    docs: DataFrame,
    plant_mod: int = 5,
    drop_every: int = 7,
    id_offset: int = 1_000_000,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Entity-resolution blocking efficiency — reduction ratio vs
    pairs completeness of the gram-blocking scheme.

    Christen, "A survey of indexing techniques for scalable record
    linkage and deduplication" (TKDE 2012): a blocking scheme is
    judged by two numbers — the REDUCTION RATIO (fraction of the
    n(n-1)/2 comparison space it prunes) and PAIRS COMPLETENESS (the
    fraction of TRUE matching pairs that survive into some block).
    This audit scores the word-trigram blocking that feeds the
    containment detector, against the same planted-duplicate truth as
    ``planted_dup_eval`` (which scores the downstream DETECTOR; this
    scores the candidate GENERATOR — the number that decides cluster
    cost at 10^12 docs).

    One row: (n_records, total_pairs, candidate_pairs,
    reduction_ratio, n_true_pairs, true_pairs_blocked,
    pairs_completeness).
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    kept = F.filter(
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size(words) - 1, F.lit(0))
            ),
            lambda i: F.when(
                (i < F.size(words)) & ((i + 1) % drop_every != 0),
                F.get(words, i),
            ),
        ),
        lambda w: w.isNotNull(),
    )
    perturbed = docs.filter(F.col(id_col) % plant_mod == 0).select(
        (F.col(id_col) + id_offset).alias(id_col),
        F.array_join(kept, " ").alias(text_col),
    )
    corpus = docs.select(id_col, text_col).unionByName(perturbed)
    n_records = corpus.count()
    w2 = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size(w2) - 1, F.lit(0)))
    grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(
                        idx,
                        lambda i: F.when(
                            i + n - 1 < F.size(w2),
                            F.concat_ws(
                                " ",
                                F.get(w2, i),
                                F.get(w2, i + 1),
                                F.get(w2, i + 2),
                            ),
                        ),
                    ),
                    lambda g: g.isNotNull(),
                )
            )
        ).alias("gram"),
    )
    cand = (
        grams.alias("l")
        .join(
            grams.alias("r"),
            (F.col("l.gram") == F.col("r.gram"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
        )
        .distinct()
    )
    n_cand = cand.count()
    planted = docs.filter(F.col(id_col) % plant_mod == 0).select(
        F.col(id_col).alias("a"),
        (F.col(id_col) + id_offset).alias("b"),
    )
    n_true = planted.count()
    blocked = cand.join(planted, ["a", "b"]).count()
    total_pairs = n_records * (n_records - 1) // 2
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_records,
                total_pairs,
                n_cand,
                round(1.0 - n_cand / total_pairs, round_digits),
                n_true,
                blocked,
                round(blocked / n_true, round_digits)
                if n_true
                else 0.0,
            )
        ],
        "n_records long, total_pairs long, candidate_pairs long, "
        "reduction_ratio double, n_true_pairs long, "
        "true_pairs_blocked long, pairs_completeness double",
    )
