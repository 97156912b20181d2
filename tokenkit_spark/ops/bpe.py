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


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_PATTERN,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Train a BPE merge table on the corpus; returns merges in rank
    order. Stops early when the best pair's corpus frequency drops below
    ``min_pair_freq``.

    The (symbols, freq) working table stays distributed; each iteration
    rewrites ONLY the words containing the chosen pair (JVM adjacency
    filter first). ``localCheckpoint`` every few merges truncates the
    growing lineage (the loop is the one place plan depth scales with
    model size, not data size)."""
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

    schema = "symbols array<string>, freq long"
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        top = (
            _adjacent_pair_counts(words)
            .orderBy(F.col("pair_freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_freq"] < min_pair_freq:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))

        # CASE guard: sequence(1, 0) counts DOWN in Spark, so sub-2-symbol
        # words would index symbols[-1] (ANSI array error) without it
        has_pair = F.expr(
            "CASE WHEN size(symbols) < 2 THEN false ELSE "
            "exists(sequence(1, size(symbols) - 1), "
            f"i -> symbols[i-1] = {_sql_str(left)} AND symbols[i] = {_sql_str(right)}) END"
        )
        hit = words.filter(has_pair)
        miss = words.filter(~has_pair)
        # union SUMS partition counts — without the coalesce the working
        # table doubles its partitions every merge (8 -> 32k by merge 12)
        # and scheduling near-empty Arrow tasks dwarfs the actual work
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
