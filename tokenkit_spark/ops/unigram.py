"""Unigram-LM subword vocabulary induction (SentencePiece-style).

Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (ACL 2018) trains the unigram
tokenizer LLMs' SentencePiece uses: a piece vocabulary with
probabilities, fit so each word's best segmentation maximizes unigram
likelihood.  This module implements the deterministic hard-EM variant
(Viterbi E-step, add-one-smoothed count M-step, no subword sampling),
completing the trainer family next to BPE (merge-frequency argmax) and
WordPiece (likelihood-ratio argmax) in ``ops/bpe.py``:

1. **Seed**: all substrings (length <= ``max_piece_len``) of the
   pretoken vocabulary, scored freq x length; top ``seed_size``
   multi-char pieces + every single character.
2. **Hard-EM** for ``n_iter`` rounds: Viterbi-segment every distinct
   pretoken under current piece log-probs (ties: higher logprob, then
   LONGER piece, then lexicographically smaller — fully deterministic),
   accumulate word-frequency-weighted piece counts, re-estimate
   ``p(piece) = (c + 1) / (total + V)`` (add-one over the retained
   vocabulary, so no piece hits log 0 and no drops mid-EM).
3. **Prune** to ``max_vocab`` by (prob desc, piece asc), always
   retaining every single character (the SentencePiece required-char
   rule, so any word stays encodable).

Scale shape: everything heavy runs over the PRETOKEN FREQUENCY table
(vocabulary-sized, not corpus-sized) — substring seeding is one
explode + count, each E-step is one Arrow-batched ``mapInPandas``
Viterbi over distinct pretokens with the (bounded, vocab-sized) piece
table as a broadcast plain dict, each M-step one explode + sum.  Only
the piece table itself (<= seed_size + alphabet rows) ever reaches the
driver — it IS the model.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import pretoken_counts
from .textstats import BPE_PRETOKEN_PATTERN


def viterbi_segment(word: str, logp: dict[str, float],
                    max_len: int) -> list[str]:
    """Best unigram segmentation of ``word`` under piece log-probs;
    deterministic tie-break (logprob, piece length, reversed-lex) —
    see module docstring. Pieces absent from ``logp`` are unusable;
    single chars are assumed present (required-char rule)."""
    n = len(word)
    best = [(-math.inf, 0)] * (n + 1)  # (score, start_of_last_piece)
    best[0] = (0.0, 0)
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j][0] == -math.inf:
                continue
            score = best[j][0] + lp
            # tie-break: higher score, then longer piece (smaller j),
            # then lexicographically smaller piece
            key = (score, i - j, piece)
            if cand is None or (
                key[0] > cand[0][0]
                or (key[0] == cand[0][0] and key[1] > cand[0][1])
                or (key[0] == cand[0][0] and key[1] == cand[0][1]
                    and key[2] < cand[0][2])
            ):
                cand = (key, j)
        if cand is not None:
            best[i] = (cand[0][0], cand[1])
    if best[n][0] == -math.inf:
        return list(word)  # unreachable when all chars are in vocab
    out = []
    i = n
    while i > 0:
        j = best[i][1]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _segment_kernel(logp: dict[str, float], max_len: int):
    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            yield pd.DataFrame(
                {
                    "pieces": [
                        viterbi_segment(w, logp, max_len)
                        for w in pdf["pretoken"]
                    ],
                    "freq": pdf["freq"],
                }
            )

    return fn


def train_unigram(
    docs: DataFrame,
    max_vocab: int = 100,
    seed_size: int = 150,
    max_piece_len: int = 6,
    n_iter: int = 3,
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_PATTERN,
) -> list[tuple[str, float]]:
    """Train the unigram vocabulary; returns [(piece, logprob)] in
    (prob desc, piece asc) order, log-probs from the final M step."""
    words = pretoken_counts(docs, text_col, pattern).persist()
    words.count()

    # --- seed ---
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(pretoken)), "
                f"i -> transform(sequence(i, least(length(pretoken), i + {max_piece_len - 1})), "
                "j -> substring(pretoken, i, j - i + 1))))"
            )
        ).alias("piece"),
        "freq",
    ).groupBy("piece").agg(F.sum("freq").alias("pfreq"))
    chars = [
        r["piece"]
        for r in subs.filter(F.length("piece") == 1).collect()
    ]
    multi = [
        r["piece"]
        for r in subs.filter(F.length("piece") > 1)
        .orderBy(
            (F.col("pfreq") * F.length("piece")).desc(), F.col("piece").asc()
        )
        .limit(seed_size)
        .collect()
    ]
    vocab = sorted(set(chars) | set(multi))

    # seed probs from raw substring frequencies (add-one smoothed)
    pf = {
        r["piece"]: r["pfreq"]
        for r in subs.filter(F.col("piece").isin(vocab)).collect()
    }

    def m_step(counts: dict[str, int]) -> dict[str, float]:
        total = sum(counts.get(v, 0) for v in vocab)
        denom = total + len(vocab)
        return {v: math.log((counts.get(v, 0) + 1) / denom) for v in vocab}

    logp = m_step(pf)

    # --- hard EM ---
    for _ in range(n_iter):
        seg = words.mapInPandas(
            _segment_kernel(logp, max_piece_len),
            "pieces array<string>, freq long",
        )
        counts = {
            r["piece"]: r["c"]
            for r in seg.select(F.explode("pieces").alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("c"))
            .collect()
        }
        logp = m_step(counts)

    words.unpersist()

    # --- prune ---
    ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = [p for p, _ in ranked[:max_vocab]]
    kept = set(keep) | {v for v in vocab if len(v) == 1}
    return sorted(
        ((p, lp) for p, lp in logp.items() if p in kept),
        key=lambda kv: (-kv[1], kv[0]),
    )


def unigram_vocab_table(
    docs: DataFrame, **kw
) -> DataFrame:
    """(rank, piece, logprob) — the trained unigram vocabulary as a
    DataFrame, logprob rounded to 6dp."""
    model = train_unigram(docs, **kw)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(i, p, round(lp, 6)) for i, (p, lp) in enumerate(model)],
        "rank long, piece string, logprob double",
    )
