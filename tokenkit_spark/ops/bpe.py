"""Distributed byte-pair-encoding (BPE) tokenizer: training + encoding.

The LLM-pipeline companion to the reference's word-level tokenizers
(ext/tokenkit/src/tokenizer/mod.rs tokenizes; an LLM pipeline must also
COUNT and BUDGET subword tokens): train a merge table on the corpus with
the classic Sennrich et al. 2016 frequency algorithm, then encode
documents with it.

Scale design — where the work lives at 100 TB:

* Training operates on the PRE-TOKEN FREQUENCY table (distinct pretoken,
  total corpus frequency), which is vocabulary-sized (10^6-10^8 rows),
  orders of magnitude smaller than the corpus. It is built with ONE
  corpus pass (regexp_extract_all + explode + map-side-combinable count)
  and stays a distributed DataFrame throughout; the training loop never
  collects it.
* Each merge step is two bounded operations over that table: an
  adjacent-pair weighted count (explode bigrams -> groupBy -> sum, all
  JVM until the 1-row argmax collect) and a merge application that
  FILTERS to the words actually containing the pair (JVM array lambda)
  before the Arrow-batched rewrite touches Python.
* Only the merge table itself (n_merges rows) ever lives on the driver
  — it is the model, broadcast for encoding.
* Encoding is embarrassingly parallel: one Arrow batch at a time, the
  classic rank-greedy merge loop per pretoken with an LRU of encoded
  pretokens per batch (Zipf: a batch's distinct-pretoken count is far
  below its token count).

Determinism: pair argmax tie-breaks (freq desc, left asc, right asc);
no RNG anywhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import BPE_PRETOKEN_PATTERN

# marks "this symbol continues the previous one" when rendering vocab
# entries; training operates on plain symbol tuples so no marker logic
# leaks into the merge algebra


def pretoken_counts(
    docs: DataFrame, text_col: str = "text", pattern: str = BPE_PRETOKEN_PATTERN
) -> DataFrame:
    """One corpus pass -> (pretoken, freq): the vocabulary-sized table
    BPE training runs on."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
            ).alias("pretoken")
        )
        .groupBy("pretoken")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over (symbols, freq) — JVM
    array lambdas, map-side combinable."""
    pairs = words.select(
        F.explode(
            F.when(
                F.size("symbols") < 2, F.array().cast("array<struct<l:string,r:string>>")
            ).otherwise(
                F.expr(
                    "transform(sequence(1, size(symbols) - 1), "
                    "i -> struct(symbols[i-1] AS l, symbols[i] AS r))"
                )
            )
        ).alias("p"),
        "freq",
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("freq").alias("pair_freq")
    )


def _apply_merge_kernel(left: str, right: str):
    """Arrow-batched rewrite: replace every adjacent (left, right) with
    the concatenated symbol, left-to-right (the classic BPE scan)."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        merged_sym = left + right
        for pdf in batch_iter:
            out = []
            for syms in pdf["symbols"]:
                syms = list(syms)
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(merged_sym)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["symbols"] = out
            yield pdf

    return fn


def _apply_merges_kernel(pairs: list[tuple[str, str]]):
    """Arrow-batched rewrite applying a BATCH of pairwise
    non-interacting merges in one pass: left-to-right scan with a dict
    lookup per position. Because no two pairs in the batch share a
    symbol (or a merged symbol), the simultaneous left-to-right scan
    produces exactly the same result as applying the pairs one at a
    time in rank order."""
    table = {p: p[0] + p[1] for p in pairs}

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            out = []
            for syms in pdf["symbols"]:
                syms = list(syms)
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and (syms[i], syms[i + 1]) in table:
                        res.append(table[(syms[i], syms[i + 1])])
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["symbols"] = out
            yield pdf

    return fn


def _select_merge_batch(
    top: list, limit: int, min_pair_freq: int, max_batch: int
) -> list[tuple[str, str]]:
    """Maximal prefix of the (pair_freq desc, l, r)-sorted pair list
    that the sequential trainer would provably pick in this exact
    order — the standard non-interacting-merges batching trick, made
    EXACT:

    * pairs are accepted in sorted order until one *interacts* with the
      accepted set (shares a left/right symbol, or collides with an
      accepted pair's merged symbol).  Pairs created or changed by
      applying the accepted merges are bounded above by the count of
      some interacting pair, which by the stop rule sits at or below
      the stop position;
    * the batch is then trimmed to counts STRICTLY above the stop
      count, so no changed/new pair can tie (sequential tie-break is
      (count desc, l asc, r asc), and a tie could otherwise reorder);
    * if the candidate list was truncated at ``limit``, the unseen tail
      is treated as interacting at the last seen count (conservative).

    Guarantees: result is non-empty whenever the top pair clears
    ``min_pair_freq`` (worst case it degrades to the single top pair,
    which is trivially the sequential choice)."""
    if not top or top[0]["pair_freq"] < min_pair_freq:
        return []
    used: set = set()
    batch: list[tuple[str, str, int]] = []
    stop_count = 0
    truncated = len(top) >= limit
    for row in top:
        if row["pair_freq"] < min_pair_freq or len(batch) >= max_batch:
            stop_count = row["pair_freq"]
            truncated = False
            break
        if row["l"] in used or row["r"] in used:
            stop_count = row["pair_freq"]
            truncated = False
            break
        batch.append((row["l"], row["r"], row["pair_freq"]))
        used.add(row["l"])
        used.add(row["r"])
        used.add(row["l"] + row["r"])
    if truncated:
        stop_count = top[-1]["pair_freq"]
    trimmed = [(l, r) for (l, r, c) in batch if c > stop_count]
    if not trimmed:
        # flat-count region: fall back to the single sequential choice
        trimmed = [(batch[0][0], batch[0][1])]
    return trimmed


def _train_bpe_local(
    words: list,
    n_merges: int,
    min_pair_freq: int,
) -> list[tuple[str, str]]:
    """Exact in-memory BPE on a collected (symbols, freq) table —
    identical semantics to the distributed loop (weighted pair counts,
    (count desc, l asc, r asc) tie-break, left-to-right single-pass
    rewrite, min_pair_freq stop), with incremental count maintenance
    and a lazy-invalidation heap so each merge costs O(occurrences),
    not O(vocabulary)."""
    import heapq
    from collections import Counter, defaultdict

    words = [[list(syms), int(fr)] for syms, fr in words]
    pair_counts: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)

    def wpairs(syms):
        return [
            (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
        ]

    for wi, (syms, fr) in enumerate(words):
        for pr in wpairs(syms):
            pair_counts[pr] += fr
            pair_words[pr].add(wi)
    heap = [(-c, l, r) for (l, r), c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, l, r = heapq.heappop(heap)
        cur = pair_counts.get((l, r), 0)
        if cur != -negc:
            if cur > 0:  # stale entry; reinsert at the live count
                heapq.heappush(heap, (-cur, l, r))
            continue
        if cur < min_pair_freq:
            break
        merges.append((l, r))
        merged = l + r
        for wi in list(pair_words[(l, r)]):
            syms, fr = words[wi]
            old = wpairs(syms)
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new = wpairs(res)
            co, cn = Counter(old), Counter(new)
            for pr, d in (cn - co).items():
                pair_counts[pr] += d * fr
                pair_words[pr].add(wi)
                heapq.heappush(heap, (-pair_counts[pr], pr[0], pr[1]))
            for pr, d in (co - cn).items():
                pair_counts[pr] -= d * fr
                if pair_counts[pr] <= 0:
                    pair_counts.pop(pr, None)
                if pr not in cn:
                    pair_words[pr].discard(wi)
                elif pair_counts.get(pr, 0) > 0:
                    heapq.heappush(
                        heap, (-pair_counts[pr], pr[0], pr[1])
                    )
            words[wi][0] = res
        # NOTE: no unconditional pop of (l, r) here — the delta loop
        # already zeroed it, and a merged-symbol string collision can
        # legitimately RE-CREATE the pair inside the same rewrite pass
        # (the single-pass kernel does not re-scan emitted symbols), in
        # which case it must stay live for a later merge exactly as the
        # distributed recount would find it.
    return merges



def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_PATTERN,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
    max_batch: int = 256,
    local_finish_cells: int = 8_000_000,
) -> list[tuple[str, str]]:
    """Train a BPE merge table on the corpus; returns merges in rank
    order. Stops early when the best pair's corpus frequency drops below
    ``min_pair_freq``.

    The (symbols, freq) working table stays distributed; each iteration
    applies a BATCH of provably order-preserving non-interacting merges
    (see _select_merge_batch), so a 32k-merge vocabulary costs hundreds
    of Spark jobs, not 32k sequential ones — the r03 verdict's corpus-
    scale blocker for this trainer. Words not containing any batch pair
    are filtered JVM-side before the Arrow kernel. ``localCheckpoint``
    every few iterations truncates the growing lineage (the loop is the
    one place plan depth scales with model size, not data size).

    The working table is VOCABULARY-sized (distinct pretokens), not
    corpus-sized, and its row count never changes during training — so
    when it fits comfortably on the driver (``local_finish_cells``
    symbol cells; one agg job decides) the whole run collapses to ONE
    collect plus an exact in-memory trainer (_train_bpe_local, same
    tie-break / rewrite / stop semantics, incremental counts + lazy
    heap). A 10^8-pretoken 100-TB corpus stays on the distributed
    batched path; the driver finish is what makes 32k-merge training
    on vocabulary-bounded tables cost jobs proportional to nothing.
    Set local_finish_cells=0 to force the distributed path."""
    spark = docs.sparkSession
    words = (
        pretoken_counts(docs, text_col, pattern)
        .select(
            F.expr("transform(sequence(1, length(pretoken)), "
                   "i -> substring(pretoken, i, 1))").alias("symbols"),
            "freq",
        )
        .persist()
    )
    words.count()  # materialize before the loop

    if local_finish_cells:
        n_cells = words.select(
            F.sum(F.size("symbols")).alias("c")
        ).collect()[0]["c"] or 0
        if n_cells <= local_finish_cells:
            rows = words.collect()
            words.unpersist()
            return _train_bpe_local(
                [(r["symbols"], r["freq"]) for r in rows],
                n_merges,
                min_pair_freq,
            )

    schema = "symbols array<string>, freq long"
    merges: list[tuple[str, str]] = []
    step = 0
    while len(merges) < n_merges:
        limit = min(4 * max_batch, 1024)
        top = (
            _adjacent_pair_counts(words)
            .orderBy(F.col("pair_freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(limit)
            .collect()
        )
        batch = _select_merge_batch(
            top, limit, min_pair_freq,
            min(max_batch, n_merges - len(merges)),
        )
        if not batch:
            break
        merges.extend(batch)

        if len(batch) <= 16:
            # CASE guard: sequence(1, 0) counts DOWN in Spark, so
            # sub-2-symbol words would index symbols[-1] (ANSI array
            # error) without it
            any_pair = " OR ".join(
                f"(symbols[i-1] = {_sql_str(l)} AND symbols[i] = {_sql_str(r)})"
                for l, r in batch
            )
            has_pair = F.expr(
                "CASE WHEN size(symbols) < 2 THEN false ELSE "
                f"exists(sequence(1, size(symbols) - 1), i -> {any_pair}) END"
            )
            hit = words.filter(has_pair)
            miss = words.filter(~has_pair)
        else:
            # large batches touch most words; the JVM pre-filter would
            # cost more than the kernel pass it saves
            hit = words
            miss = None
        # union SUMS partition counts — without the coalesce the working
        # table doubles its partitions every merge (8 -> 32k by merge 12)
        # and scheduling near-empty Arrow tasks dwarfs the actual work
        n_base = max(spark.sparkContext.defaultParallelism, 2)
        rewritten = hit.mapInPandas(_apply_merges_kernel(batch), schema)
        new_words = (
            miss.unionByName(rewritten) if miss is not None else rewritten
        ).coalesce(n_base)
        step += 1
        if step % checkpoint_every == 0:
            new_words = new_words.localCheckpoint(eager=True)
        else:
            new_words = new_words.persist()
            new_words.count()
        words.unpersist()
        words = new_words
    words.unpersist()
    return merges


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic rank-greedy BPE encode of one pretoken."""
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL occurrences of this lowest-rank pair, left to right
        pair = (syms[best], syms[best + 1])
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == pair[0]
                and syms[i + 1] == pair[1]
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_PATTERN,
) -> DataFrame:
    """Encode every document with a trained merge table: returns
    (doc_id, tokens array<string>). Arrow-batched; a per-batch memo of
    already-encoded pretokens exploits Zipf (distinct pretokens per
    batch << token count)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    import regex as _re

    rx = _re.compile(pattern)

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batch_iter:
            toks_out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in rx.findall(text or ""):
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                toks_out.append(toks)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "tokens": toks_out})

    return docs.select("doc_id", text_col).mapInPandas(
        fn, "doc_id long, tokens array<string>"
    )


def bpe_token_stats(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Per-doc LLM token accounting under a trained BPE model:
    (doc_id, n_tokens, n_types, chars_per_token)."""
    enc = encode_bpe(docs, merges)
    return enc.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_types"),
        F.round(
            F.aggregate("tokens", F.lit(0), lambda a, t: a + F.length(t)).cast("double")
            / F.greatest(F.size("tokens"), F.lit(1)),
            4,
        ).alias("chars_per_token"),
    )


def bpe_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str = "lang",
    pattern: str = BPE_PRETOKEN_PATTERN,
) -> DataFrame:
    """Tokenizer FERTILITY audit per corpus slice: subword tokens per
    pretoken word and chars per token, grouped by ``group_col`` — the
    standard multilinguality health check for a tokenizer (a language
    whose fertility is 2x another's pays 2x the sequence length for the
    same text, which is a real training-budget and context-window tax;
    cf. the fertility tables in the BLOOM/XLM-R tokenizer analyses).

    Returns (group, n_docs, n_words, n_tokens, fertility,
    chars_per_token), groups ordered; docs with zero pretokens are
    excluded (no words to be fertile over). One Arrow-batched pass with
    the same per-batch pretoken memo as encode_bpe; the reduction is a
    groups-sized hash agg."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    import regex as _re

    rx = _re.compile(pattern)

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batch_iter:
            nw, nt, nc = [], [], []
            for text in pdf[text_col]:
                words = rx.findall(text or "")
                t = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(_encode_word(w, ranks))
                        memo[w] = n
                    t += n
                nw.append(len(words))
                nt.append(t)
                nc.append(sum(len(w) for w in words))
            yield pd.DataFrame(
                {"grp": pdf[group_col], "nw": nw, "nt": nt, "nc": nc}
            )

    per_doc = docs.select(F.col(group_col).alias(group_col), text_col).mapInPandas(
        fn, "grp string, nw long, nt long, nc long"
    )
    return (
        per_doc.filter(F.col("nw") > 0)
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nw").alias("n_words"),
            F.sum("nt").alias("n_tokens"),
            F.round(F.sum("nt") / F.sum("nw").cast("double"), 4).alias(
                "fertility"
            ),
            F.round(F.sum("nc") / F.sum("nt").cast("double"), 4).alias(
                "chars_per_token"
            ),
        )
        .orderBy(group_col)
    )


# ---------------------------------------------------------------------------
# WordPiece (Schuster & Nakajima, "Japanese and Korean Voice Search",
# ICASSP 2012; the BERT tokenizer): same merge loop as BPE but the pair
# to merge maximizes the LIKELIHOOD score
#
#     score(a, b) = count(ab) / (count(a) * count(b))
#
# (the pair whose merge most increases the unigram-LM corpus
# likelihood), and encoding is greedy longest-match-first against the
# final vocabulary rather than rank-greedy merge replay.  Vocabulary
# pieces here are position-independent strings (the BERT '##'
# continuation marker is RENDERED on output, not trained as distinct
# symbols) — documented simplification, mirrored exactly by the tests'
# reference implementation and the pinned oracle map.
# ---------------------------------------------------------------------------


def _symbol_freqs(words: DataFrame) -> DataFrame:
    return (
        words.select(F.explode("symbols").alias("sym"), "freq")
        .groupBy("sym")
        .agg(F.sum("freq").alias("sym_freq"))
    )


def train_wordpiece(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_PATTERN,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Train a WordPiece merge table; returns merges in rank order.
    Same distributed shape as ``train_bpe`` (the working table never
    collects; each step rewrites only words containing the chosen
    pair); the argmax adds two broadcast-sized joins of the pair table
    with current symbol frequencies.  Ties break (score desc,
    pair_freq desc, l asc, r asc) — deterministic: all inputs are
    exact integer counts, so the score double is reproducible."""
    spark = docs.sparkSession
    words = (
        pretoken_counts(docs, text_col, pattern)
        .select(
            F.expr("transform(sequence(1, length(pretoken)), "
                   "i -> substring(pretoken, i, 1))").alias("symbols"),
            "freq",
        )
        .persist()
    )
    words.count()

    schema = "symbols array<string>, freq long"
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        syms = _symbol_freqs(words)
        top = (
            _adjacent_pair_counts(words)
            .join(
                syms.select(
                    F.col("sym").alias("l"), F.col("sym_freq").alias("fl")
                ),
                "l",
            )
            .join(
                syms.select(
                    F.col("sym").alias("r"), F.col("sym_freq").alias("fr")
                ),
                "r",
            )
            .withColumn(
                "score", F.col("pair_freq") / (F.col("fl") * F.col("fr"))
            )
            .orderBy(
                F.col("score").desc(), F.col("pair_freq").desc(),
                F.col("l").asc(), F.col("r").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_freq"] < min_pair_freq:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))

        has_pair = F.expr(
            "CASE WHEN size(symbols) < 2 THEN false ELSE "
            "exists(sequence(1, size(symbols) - 1), "
            f"i -> symbols[i-1] = {_sql_str(left)} AND symbols[i] = {_sql_str(right)}) END"
        )
        hit = words.filter(has_pair)
        miss = words.filter(~has_pair)
        n_base = max(spark.sparkContext.defaultParallelism, 2)
        new_words = miss.unionByName(
            hit.mapInPandas(_apply_merge_kernel(left, right), schema)
        ).coalesce(n_base)
        if (step + 1) % checkpoint_every == 0:
            new_words = new_words.localCheckpoint(eager=True)
        else:
            new_words = new_words.persist()
            new_words.count()
        words.unpersist()
        words = new_words
    words.unpersist()
    return merges


def wordpiece_vocab(
    merges: list[tuple[str, str]], alphabet: set[str] | list[str]
) -> list[str]:
    """Final vocabulary: corpus alphabet + every merge product,
    deterministic sorted order."""
    return sorted(set(alphabet) | {l + r for l, r in merges})


def _encode_word_wordpiece(
    word: str, vocab: set[str], unk: str = "[UNK]"
) -> list[str]:
    """Greedy longest-match-first (the BERT WordpieceTokenizer scan);
    a word with any unmatchable remainder encodes to [unk] whole."""
    pieces: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        while j > i and word[i:j] not in vocab:
            j -= 1
        if j == i:
            return [unk]
        pieces.append(("##" if i > 0 else "") + word[i:j])
        i = j
    return pieces


def encode_wordpiece(
    docs: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_PATTERN,
    unk: str = "[UNK]",
) -> DataFrame:
    """(doc_id, tokens array<string>) under greedy longest-match
    WordPiece encoding; Arrow-batched with the same per-batch pretoken
    memo as encode_bpe."""
    vset = set(vocab)
    import regex as _re

    rx = _re.compile(pattern)

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batch_iter:
            toks_out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in rx.findall(text or ""):
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word_wordpiece(w, vset, unk)
                        memo[w] = enc
                    toks.extend(enc)
                toks_out.append(toks)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "tokens": toks_out})

    return docs.select("doc_id", text_col).mapInPandas(
        fn, "doc_id long, tokens array<string>"
    )


def wordpiece_token_stats(
    docs: DataFrame, vocab: list[str], unk: str = "[UNK]"
) -> DataFrame:
    """Per-doc accounting under a WordPiece vocab:
    (doc_id, n_tokens, n_types, n_unk, chars_per_token)."""
    enc = encode_wordpiece(docs, vocab, unk=unk)
    return enc.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_types"),
        F.size(F.filter("tokens", lambda t: t == unk)).alias("n_unk"),
        F.round(
            F.aggregate("tokens", F.lit(0), lambda a, t: a + F.length(t)).cast("double")
            / F.greatest(F.size("tokens"), F.lit(1)),
            4,
        ).alias("chars_per_token"),
    )
