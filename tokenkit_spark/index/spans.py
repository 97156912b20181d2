"""Positional span queries over the compressed segment index.

Elasticsearch/Lucene span-family surface (the positional queries beyond
plain sloppy phrase, which lives in ``query.proximity_search``):

* ``span_near``           — unordered span_near: every clause term occurs
                            inside one window of at most
                            (n_terms - 1) + slop positions, any order
                            (Lucene SpanNearQuery ``inOrder=false``).
                            The ordered variant IS ``proximity_search``.
* ``span_first``          — the term occurs with span end <= ``end``
                            (Lucene SpanFirstQuery over a span_term).
* ``match_phrase_prefix`` — exact phrase whose LAST term is a prefix,
                            expanded against the index vocabulary in
                            lexicographic order up to ``max_expansions``
                            (the ES match_phrase_prefix contract).

Scale shape (same as query.py's phrase path): query terms broadcast
against segments with term_bucket+term pushdown, posting blobs never
shuffle — only per-shard match rows do; the per-shard kernel decodes
positions with the vectorized codec.

Reference parity: the reference is a tokenization library
(ext/tokenkit/src/tokenizer/mod.rs); span semantics follow the public
Lucene/ES contracts named above. Query analysis reuses the index
analyzer config (README.md:512-541 contract).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import AnalyzerConfig
from . import codec
from .build import term_bucket_col
from .query import _shard_partitions, analyze_phrases, phrase_search


def _require_positions(index: dict, what: str) -> tuple[int, int]:
    stats = index["stats"]
    if stats.get("store_positions") is False:
        raise ValueError(
            f"{what} requires a positional index; this one was built with "
            "store_positions=False"
        )
    return int(stats["n_shards"]), int(stats["n_buckets"])


def _min_cover_window(pos_lists: list[np.ndarray]) -> int | None:
    """Minimal window (max - min position) covering one position from
    EVERY list, any order — the classic k-sorted-lists minimum-range
    scan over the label-merged position stream. Returns None when some
    list is empty."""
    k = len(pos_lists)
    if any(p.size == 0 for p in pos_lists):
        return None
    if k == 1:
        return 0
    merged = np.concatenate(pos_lists)
    labels = np.concatenate(
        [np.full(p.size, i, dtype=np.int32) for i, p in enumerate(pos_lists)]
    )
    order = np.argsort(merged, kind="stable")
    merged, labels = merged[order], labels[order]
    need = k
    count = np.zeros(k, dtype=np.int64)
    best = None
    left = 0
    for right in range(merged.size):
        lab = labels[right]
        count[lab] += 1
        if count[lab] == 1:
            need -= 1
        while need == 0:
            span = int(merged[right] - merged[left])
            if best is None or span < best:
                best = span
            lab_l = labels[left]
            count[lab_l] -= 1
            if count[lab_l] == 0:
                need += 1
            left += 1
    return best


def _span_near_kernel(slop: int):
    """mapInPandas kernel: per (query, doc-shard) group, intersect the
    clause posting lists, then compute the minimal UNORDERED covering
    window per surviving doc; emit (query_id, doc_id, span) when
    span <= (n_terms - 1) + slop."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], dict[int, dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {
                    "n_postings": int(row.n_postings),
                    "doc_ids_blob": row.doc_ids_blob,
                    "tfs_blob": row.tfs_blob,
                    "dls_blob": row.dls_blob,
                    "pos_blob": row.pos_blob,
                    "codec": getattr(row, "codec", "varint"),
                    "block_doc_off": getattr(row, "block_doc_off", None),
                    "block_last": getattr(row, "block_last", None),
                }
                for occ in row.occurrences:
                    groups.setdefault((int(occ["query_id"]), int(row.shard)), {})[
                        int(occ["seq"])
                    ] = t
        out_q, out_d, out_s = [], [], []
        for (q, _shard), by_seq in groups.items():
            n_terms = max(by_seq) + 1
            if len(by_seq) < n_terms:
                continue  # some clause term absent from this shard
            max_span = (n_terms - 1) + slop
            decoded = {}
            for t in by_seq.values():
                key = id(t)
                if key not in decoded:
                    ids, tfs, _dls = codec.decode_posting_list(t)
                    pos, offs = codec.decode_positions(bytes(t["pos_blob"]), tfs)
                    decoded[key] = (ids, tfs, pos, offs)
            seqs = sorted(by_seq, key=lambda s: decoded[id(by_seq[s])][0].size)
            cand = decoded[id(by_seq[seqs[0]])][0]
            for s in seqs[1:]:
                cand = cand[np.isin(cand, decoded[id(by_seq[s])][0], assume_unique=True)]
                if cand.size == 0:
                    break
            for d in cand.tolist():
                pos_lists = []
                for seq in range(n_terms):
                    ids, tfs, pos, offs = decoded[id(by_seq[seq])]
                    j = int(np.searchsorted(ids, d))
                    pos_lists.append(pos[offs[j] : offs[j] + tfs[j]])
                span = _min_cover_window(pos_lists)
                if span is not None and span <= max_span:
                    out_q.append(q)
                    out_d.append(d)
                    out_s.append(span)
        yield pd.DataFrame({"query_id": out_q, "doc_id": out_d, "span": out_s})

    return fn


def span_near(
    spark: SparkSession,
    index: dict,
    clauses: DataFrame,
    config: AnalyzerConfig | None = None,
    slop: int = 0,
) -> DataFrame:
    """Unordered span_near (Lucene SpanNearQuery inOrder=false): returns
    (query_id, doc_id, span) for documents containing every analyzed
    clause term within a window of at most (n_terms - 1) + slop
    positions in ANY order; span is the minimal such window. Duplicate
    clause terms are rejected (each needs a distinct position — use the
    ordered variant, proximity_search, for repeated-term phrases)."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    cfg = config or AnalyzerConfig()
    n_shards, n_buckets = _require_positions(index, "span_near")

    p_terms = analyze_phrases(clauses, cfg)
    dup = (
        p_terms.groupBy("query_id", "term")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"span_near clauses must be distinct terms; query "
            f"{dup[0]['query_id']} repeats {dup[0]['term']!r}"
        )
    terms = [r.term for r in p_terms.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame([], "query_id long, doc_id long, span long")
    buckets = list(
        {
            b.term_bucket
            for b in spark.createDataFrame([(t,) for t in terms], "term string")
            .select(term_bucket_col(F.col("term"), n_buckets).alias("term_bucket"))
            .collect()
        }
    )
    occurrences = p_terms.groupBy("term").agg(
        F.collect_list(F.struct("query_id", "seq")).alias("occurrences")
    )
    seg = (
        index["segments"]
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    matched = seg.join(F.broadcast(occurrences), "term").select(
        "occurrences", "shard", "n_postings",
        "doc_ids_blob", "tfs_blob", "dls_blob", "pos_blob",
        "codec", "block_doc_off", "block_last",
    )
    out_schema = "query_id long, doc_id long, span long"
    return (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(_span_near_kernel(slop), out_schema)
        .orderBy("query_id", "doc_id")
    )


def _span_first_kernel(end: int):
    """mapInPandas kernel: per (query, doc-shard), emit
    (query_id, doc_id, first_pos) for docs whose earliest occurrence of
    the term ends at or before ``end`` (first_pos + 1 <= end)."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_q, out_d, out_p = [], [], []
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {
                    "n_postings": int(row.n_postings),
                    "doc_ids_blob": row.doc_ids_blob,
                    "tfs_blob": row.tfs_blob,
                    "dls_blob": row.dls_blob,
                    "codec": getattr(row, "codec", "varint"),
                    "block_doc_off": getattr(row, "block_doc_off", None),
                    "block_last": getattr(row, "block_last", None),
                }
                ids, tfs, _dls = codec.decode_posting_list(t)
                pos, offs = codec.decode_positions(bytes(row.pos_blob), tfs)
                first = pos[offs]  # offs[i] = posting i's start; sorted per doc
                keep = first + 1 <= end
                if not keep.any():
                    continue
                for occ in row.occurrences:
                    q = int(occ["query_id"])
                    out_q.extend([q] * int(keep.sum()))
                    out_d.extend(ids[keep].tolist())
                    out_p.extend(first[keep].tolist())
        yield pd.DataFrame({"query_id": out_q, "doc_id": out_d, "first_pos": out_p})

    return fn


def span_first(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    end: int = 10,
) -> DataFrame:
    """span_first over a span_term (Lucene SpanFirstQuery): documents
    where the analyzed single term occurs with span end <= ``end``,
    i.e. at a 0-based token position < end. Returns
    (query_id, doc_id, first_pos) with the earliest qualifying
    position."""
    if end <= 0:
        raise ValueError(f"end must be > 0, got {end}")
    cfg = config or AnalyzerConfig()
    n_shards, n_buckets = _require_positions(index, "span_first")

    p_terms = analyze_phrases(queries, cfg)
    multi = p_terms.filter(F.col("seq") > 0).limit(1).collect()
    if multi:
        raise ValueError(
            "span_first takes a single span_term per query; query "
            f"{multi[0]['query_id']} analyzed to multiple terms"
        )
    terms = [r.term for r in p_terms.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, first_pos long"
        )
    buckets = list(
        {
            b.term_bucket
            for b in spark.createDataFrame([(t,) for t in terms], "term string")
            .select(term_bucket_col(F.col("term"), n_buckets).alias("term_bucket"))
            .collect()
        }
    )
    occurrences = p_terms.groupBy("term").agg(
        F.collect_list(F.struct("query_id", "seq")).alias("occurrences")
    )
    seg = (
        index["segments"]
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    matched = seg.join(F.broadcast(occurrences), "term").select(
        "occurrences", "shard", "n_postings",
        "doc_ids_blob", "tfs_blob", "dls_blob", "pos_blob",
        "codec", "block_doc_off", "block_last",
    )
    out_schema = "query_id long, doc_id long, first_pos long"
    return (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(_span_first_kernel(end), out_schema)
        .orderBy("query_id", "doc_id")
    )


def match_phrase_prefix(
    spark: SparkSession,
    index: dict,
    phrases: DataFrame,
    config: AnalyzerConfig | None = None,
    max_expansions: int = 50,
) -> DataFrame:
    """ES match_phrase_prefix: exact phrase whose LAST term is a prefix.
    The prefix is expanded against the index vocabulary (term_stats) in
    lexicographic order, capped at ``max_expansions`` (the ES contract —
    a too-small cap silently misses matches, exactly like ES). A doc
    matches when ANY expanded phrase matches; returns
    (query_id, doc_id, n_expansions_matched).

    Scale shape: the expansion list is bounded driver-side state
    (≤ queries x max_expansions rows); phrase verification reuses the
    positional phrase kernel — postings never shuffle.

    Analyzer note: expansion terms are index vocabulary, so re-analyzing
    the expanded phrase text must be the identity on them — true for the
    word-splitting strategies; ngram-family configs are rejected."""
    cfg = config or AnalyzerConfig()
    if cfg.strategy in ("ngram", "edge_ngram", "grapheme"):
        raise ValueError(
            f"match_phrase_prefix cannot re-analyze expansions under "
            f"strategy={cfg.strategy!r}"
        )
    _require_positions(index, "match_phrase_prefix")

    p_terms = analyze_phrases(phrases, cfg).collect()
    by_q: dict[int, list[str]] = {}
    for r in sorted(p_terms, key=lambda r: (r.query_id, r.seq)):
        by_q.setdefault(int(r.query_id), []).append(r.term)
    if not by_q:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, n_expansions_matched long"
        )

    prefixes = {q: ts[-1] for q, ts in by_q.items()}
    conds = None
    for p in set(prefixes.values()):
        c = F.col("term").startswith(p)
        conds = c if conds is None else (conds | c)
    vocab = [
        r.term
        for r in index["term_stats"].filter(conds).select("term").distinct().collect()
    ]

    expanded_rows, mapping = [], {}
    next_id = 0
    for q, terms in by_q.items():
        exps = sorted(t for t in vocab if t.startswith(prefixes[q]))[:max_expansions]
        for e in exps:
            expanded_rows.append((next_id, " ".join(terms[:-1] + [e])))
            mapping[next_id] = q
            next_id += 1
    if not expanded_rows:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, n_expansions_matched long"
        )
    exp_df = spark.createDataFrame(expanded_rows, "query_id long, text string")
    hits = phrase_search(spark, index, exp_df, cfg)
    map_df = F.broadcast(
        spark.createDataFrame(
            [(k, v) for k, v in mapping.items()], "exp_id long, orig_id long"
        )
    )
    return (
        hits.withColumnRenamed("query_id", "exp_id")
        .join(map_df, "exp_id")
        .groupBy(F.col("orig_id").alias("query_id"), "doc_id")
        .agg(F.count(F.lit(1)).alias("n_expansions_matched"))
        .orderBy("query_id", "doc_id")
    )


def intervals_ordered(
    docs: DataFrame,
    terms: list[str],
    max_gaps: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `intervals` query, `match` source with ``ordered: true`` +
    ``max_gaps``: the doc matches iff some occurrence of the terms in
    the given ORDER spans a window with at most ``max_gaps`` extra
    positions between first and last — i.e. (p_last - p_first + 1) - k
    <= max_gaps. This is NOT span slop (edit-distance-style movement);
    gaps measure window looseness, the documented intervals contract.

    Relational formulation (no kernel): tokenize map-side, keep only
    the k query terms' positions (a tiny IN filter riding the explode),
    then k-1 doc-keyed equi-joins with increasing-position predicates.
    The position table is bounded by the query terms' corpus tf, and
    every join shuffles on doc_id only — the 10^12-doc shape. Returns
    (doc_id, min_gaps) per matching doc."""
    if len(terms) < 2:
        raise ValueError("intervals_ordered needs >= 2 terms")
    toks = docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("pos", "term"),
    ).filter(F.col("term").isin(list(dict.fromkeys(terms))))
    out = None
    for i, t in enumerate(terms):
        part = toks.filter(F.col("term") == t).select(
            F.col(id_col).alias(f"__d{i}"), F.col("pos").alias(f"__p{i}")
        )
        if out is None:
            out = part
        else:
            out = out.join(
                part,
                (F.col(f"__d{i}") == F.col(f"__d{i - 1}"))
                & (F.col(f"__p{i}") > F.col(f"__p{i - 1}")),
            )
    k = len(terms)
    gaps = F.col(f"__p{k - 1}") - F.col("__p0") + 1 - k
    return (
        out.withColumn("__gaps", gaps)
        .filter(F.col("__gaps") <= max_gaps)
        .groupBy(F.col("__d0").alias(id_col))
        .agg(F.min("__gaps").alias("min_gaps"))
    )


def intervals_unordered(
    docs: DataFrame,
    terms: list[str],
    max_gaps: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `intervals` query, `match` source with ``ordered: false`` +
    ``max_gaps`` (the all_of-any-order contract): the doc matches iff
    one occurrence of EACH distinct term — in ANY order — fits a window
    with (p_max - p_min + 1) - k <= max_gaps. Same gaps-not-slop rule
    as the ordered sibling above; dropping the order predicate is the
    entire semantic difference (ES docs: "intervals may occur in any
    order when ordered is false").

    Relational formulation mirrors ``intervals_ordered``: the tiny
    IN-filtered position relation, k-1 doc-keyed equi-joins (no
    position inequality), window looseness from greatest/least over
    the k picked positions. Every join shuffles on doc_id only; the
    fan-out per doc is bounded by the product of the query terms'
    per-doc tfs, the same bound the ordered variant carries. Returns
    (doc_id, min_gaps) per matching doc."""
    uniq = list(dict.fromkeys(terms))
    if len(uniq) < 2:
        raise ValueError("intervals_unordered needs >= 2 distinct terms")
    toks = docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("pos", "term"),
    ).filter(F.col("term").isin(uniq))
    out = None
    for i, t in enumerate(uniq):
        part = toks.filter(F.col("term") == t).select(
            F.col(id_col).alias(f"__d{i}"), F.col("pos").alias(f"__p{i}")
        )
        if out is None:
            out = part
        else:
            out = out.join(part, F.col(f"__d{i}") == F.col(f"__d{i - 1}"))
    k = len(uniq)
    pcols = [F.col(f"__p{i}") for i in range(k)]
    gaps = F.greatest(*pcols) - F.least(*pcols) + 1 - k
    return (
        out.withColumn("__gaps", gaps)
        .filter(F.col("__gaps") <= max_gaps)
        .groupBy(F.col("__d0").alias(id_col))
        .agg(F.min("__gaps").alias("min_gaps"))
    )


def span_not_counts(
    docs: DataFrame,
    phrase: str,
    exclude: str,
    pre: int = 0,
    post: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lucene ``SpanNotQuery`` over the relational positional stream:
    occurrences of the two-term ``phrase`` (adjacent positions) that do
    NOT have an occurrence of ``exclude`` within ``pre`` positions
    before the span start or ``post`` positions after the span end —
    the exclusion is positional, not per-document (a doc keeps its
    clean spans even when a dirty one exists elsewhere in it; that is
    the Lucene contract and the difference from a bool must_not).

    Returns (doc_id, n_spans, first_span) for docs with >= 1 surviving
    span.

    Scale shape: whitespace-lowercase tokens posexplode to
    (doc, pos, term); the phrase match is one self-equi-join on
    (doc, pos+1); the exclusion is a left_anti against the exclude
    term's positions with a bounded range predicate riding the doc-key
    equi-join (never a cross product). Everything shuffles on doc_id
    once."""
    if len(phrase.split()) != 2:
        raise ValueError("span_not_counts: phrase must be exactly two terms")
    w1, w2 = (w.lower() for w in phrase.split())
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos", "term"),
    )
    a = toks.filter(F.col("term") == w1).select("doc_id", F.col("pos").alias("p1"))
    b = toks.filter(F.col("term") == w2).select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("p2")
    )
    inc = a.join(
        b,
        (F.col("doc_id") == F.col("doc_id_b")) & (F.col("p2") == F.col("p1") + 1),
    ).select("doc_id", F.col("p1").alias("s"), F.col("p2").alias("e"))
    ex = toks.filter(F.col("term") == exclude.lower()).select(
        F.col("doc_id").alias("doc_id_x"), F.col("pos").alias("px")
    )
    good = inc.join(
        ex,
        (F.col("doc_id") == F.col("doc_id_x"))
        & (F.col("px") >= F.col("s") - pre)
        & (F.col("px") <= F.col("e") + post),
        "left_anti",
    )
    return good.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.min("s").cast("long").alias("first_span"),
    )


def _phrase_spans(toks, w1: str, w2: str, slop: int):
    """Ordered two-term spans: (doc_id, s, e) with e the w2 position,
    0 < e - s <= 1 + slop (Lucene ordered SpanNearQuery gap rule)."""
    a = toks.filter(F.col("term") == w1).select(
        "doc_id", F.col("pos").alias("s")
    )
    b = toks.filter(F.col("term") == w2).select(
        F.col("doc_id").alias("__db"), F.col("pos").alias("e")
    )
    return a.join(
        b,
        (F.col("doc_id") == F.col("__db"))
        & (F.col("e") > F.col("s"))
        & (F.col("e") <= F.col("s") + 1 + slop),
    ).select("doc_id", "s", "e")


def _pos_stream(docs, text_col: str, id_col: str):
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos", "term"),
    )


def span_containing_counts(
    docs: DataFrame,
    big: str,
    little: str,
    slop: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lucene ``SpanContainingQuery``: spans of ``big`` (ordered
    two-term near with ``slop``) that CONTAIN an occurrence of
    ``little`` (s <= p <= e). Returns (doc_id, n_spans, first_span)
    for docs with >= 1 qualifying big span.

    Scale shape: same as span_not_counts — position stream shuffles on
    doc_id once; containment is a left_semi with the range predicate
    riding the doc-key equi-join."""
    if len(big.split()) != 2:
        raise ValueError("span_containing_counts: big must be two terms")
    w1, w2 = (w.lower() for w in big.split())
    toks = _pos_stream(docs, text_col, id_col)
    spans = _phrase_spans(toks, w1, w2, slop)
    lit = toks.filter(F.col("term") == little.lower()).select(
        F.col("doc_id").alias("__dl"), F.col("pos").alias("p")
    )
    hit = spans.join(
        lit,
        (F.col("doc_id") == F.col("__dl"))
        & (F.col("p") >= F.col("s"))
        & (F.col("p") <= F.col("e")),
        "left_semi",
    )
    return hit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.min("s").cast("long").alias("first_span"),
    )


def span_within_counts(
    docs: DataFrame,
    little: str,
    big: str,
    slop: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lucene ``SpanWithinQuery``: occurrences of ``little`` that fall
    WITHIN a span of ``big`` (ordered two-term near with ``slop``).
    Returns (doc_id, n_hits, first_pos). The dual of span_containing:
    same spans, but the LITTLE side's occurrences are what is counted
    and deduplicated (a little hit inside two overlapping big spans
    counts once — the Lucene contract, since the query emits the
    little spans themselves)."""
    if len(big.split()) != 2:
        raise ValueError("span_within_counts: big must be two terms")
    w1, w2 = (w.lower() for w in big.split())
    toks = _pos_stream(docs, text_col, id_col)
    spans = _phrase_spans(toks, w1, w2, slop).select(
        F.col("doc_id").alias("__ds"), "s", "e"
    )
    lit = toks.filter(F.col("term") == little.lower()).select(
        "doc_id", F.col("pos").alias("p")
    )
    hit = lit.join(
        spans,
        (F.col("doc_id") == F.col("__ds"))
        & (F.col("p") >= F.col("s"))
        & (F.col("p") <= F.col("e")),
        "left_semi",
    )
    return hit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("p").cast("long").alias("first_pos"),
    )


def span_or_counts(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lucene ``SpanOrQuery`` over term clauses: the union of the
    clause terms' position streams, per doc. Returns
    (doc_id, n_spans, n_terms_matched, first_pos) for docs with >= 1
    hit — n_spans counts distinct positions (two clauses matching the
    same position yield one span, the Lucene merged-stream contract).

    Scale shape: a single filtered scan of the position stream + one
    doc-keyed aggregate; no joins at all."""
    tset = [t.lower() for t in terms]
    toks = _pos_stream(docs, text_col, id_col)
    hits = toks.filter(F.col("term").isin(tset))
    return hits.groupBy("doc_id").agg(
        F.countDistinct("pos").alias("n_spans"),
        F.countDistinct("term").alias("n_terms_matched"),
        F.min("pos").cast("long").alias("first_pos"),
    )
