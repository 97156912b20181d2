"""Block-Max MAXSCORE pruning — the other classic dynamic-pruning
operator (Turtle & Flood 1995, "Query evaluation: strategies and
optimizations"; block-max refinement per Ding & Suel 2011), completing
the pruning family next to Block-Max WAND (wand.py).

Where WAND processes terms rarest-first and prunes per-BLOCK against a
threshold, MAXSCORE's idea is term-level: order terms by score upper
bound DESCENDING and split them into an *essential* prefix and a
*non-essential* suffix. Once the suffix's summed upper bounds fall
below the running threshold θ, no document appearing ONLY in
non-essential lists can reach the top-k — those lists are consulted
solely to refine documents already known as candidates.

This module re-shapes that invariant term-at-a-time and vectorized
(the same no-per-posting-Python-loop rule as wand.py):

  Process terms in ub-descending order. Before term i (suffix ub sum
  ``remaining`` after it, running threshold θ = k-th best accumulated
  partial):

  * a NEW doc first appearing in term i can finish at most
    ``ub_i + remaining``; if that is < θ, term i and everything after
    it are non-essential — decode only blocks that contain an existing
    candidate, and mask decoded postings to the candidate set;
  * per block b the safe bound is ``base(b) + idf·block_ub(b) +
    remaining`` with ``base(b)`` = best accumulated partial inside b's
    docID range (floored at 0 while new docs may still enter, -inf for
    candidate-less blocks once they may not). Blocks below θ are
    SKIPPED — their bytes never decode.

Safety: partials are lower bounds of finals and θ only grows, so a
skipped block / masked posting can only belong to docs whose final
score is provably < the k-th best final. Returned top-k ids AND scores
are exact, with the same pinned tie order (score desc, doc_id asc) as
every other scoring path.

Reference parity: the reference (scientist-labs/tokenkit) is a
tokenizer library with no query engine; MAXSCORE semantics follow the
published operator and Lucene's MaxScoreBulkScorer contract
(top-k identical to exhaustive evaluation).
"""

from __future__ import annotations

import numpy as np

from . import codec
from .wand import (
    _EPS,
    _kth_best,
    _member_mask,
    _merge_acc,
    decode_blocks_cached,
    decode_full_memo,
    norms_memo,
)


def score_query_maxscore(
    terms: list[dict], avgdl: float, k: int
) -> dict:
    """Exact top-k over one (query, doc-shard) group via block-max
    MAXSCORE. Same term-dict schema and return shape as
    wand.score_query_shard, plus ``nonessential_terms`` (how many
    trailing terms were evaluated in candidate-only mode)."""
    for t in terms:
        memo = t.setdefault("_block_ub", {})
        if avgdl not in memo:
            memo[avgdl] = codec.block_bound(
                t["block_max_tf"], t["block_min_dl"], avgdl
            )
        t["_block_ub_cur"] = memo[avgdl]
    ubs = np.array(
        [t["idf"] * (t["_block_ub_cur"].max() if t["_block_ub_cur"].size else 0.0)
         for t in terms]
    )
    # MAXSCORE order: best-possible-contribution first (ub descending) —
    # the essential prefix; WAND's rarest-first is the opposite end.
    order = np.argsort(-ubs, kind="stable")
    rem_after = np.zeros(len(terms) + 1)
    rem_after[:-1] = np.cumsum(ubs[order][::-1])[::-1]

    acc_ids = np.zeros(0, dtype=np.int64)
    acc_scores = np.zeros(0, dtype=np.float64)
    blocks_total = 0
    blocks_decoded = 0
    nonessential = 0

    for i, ti in enumerate(order):
        t = terms[int(ti)]
        idf = float(t["idf"])
        block_last = np.asarray(t["block_last"], dtype=np.int64)
        block_ub = t["_block_ub_cur"]
        nblocks = block_last.size
        blocks_total += nblocks
        remaining = rem_after[i + 1]
        theta = _kth_best(acc_scores, k)
        cand_only = False

        if theta > -np.inf:
            # docs first seen in this term finish at ≤ ub_i + remaining
            cand_only = ubs[int(ti)] + remaining < theta - _EPS
            base = np.full(nblocks, -np.inf if cand_only else 0.0)
            bins = np.searchsorted(block_last, acc_ids, side="left")
            valid = bins < nblocks
            np.maximum.at(base, bins[valid], acc_scores[valid])
            survives = base + idf * block_ub + remaining >= theta - _EPS
        else:
            survives = np.ones(nblocks, dtype=bool)
        if cand_only:
            nonessential += 1

        live = np.flatnonzero(survives)
        blocks_decoded += live.size
        if live.size == 0:
            continue
        if live.size == nblocks:
            doc_ids, tfs, dls = decode_full_memo(t)
            contrib = idf * norms_memo(t, avgdl)
        else:
            # shared run-range decode path (wand.decode_blocks_cached):
            # consecutive missing blocks decode in one vectorized pass
            doc_ids, tfs, dls = decode_blocks_cached(t, live)
            contrib = idf * codec.bm25_norm(tfs, dls, avgdl)
        if cand_only:
            # non-essential list: only existing candidates may score
            m = _member_mask(doc_ids, acc_ids)
            doc_ids, contrib = doc_ids[m], contrib[m]
        acc_ids, acc_scores = _merge_acc(acc_ids, acc_scores, doc_ids, contrib)

    sel = np.lexsort((acc_ids, -acc_scores))[:k]
    return {
        "doc_ids": acc_ids[sel],
        "scores": acc_scores[sel],
        "blocks_total": blocks_total,
        "blocks_decoded": blocks_decoded,
        "nonessential_terms": nonessential,
    }
