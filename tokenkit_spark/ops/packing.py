"""Sequence packing: assign documents to fixed-capacity context windows
("bins") for LLM training — the step between a cleaned corpus and a
token-budgeted batch stream.

Algorithm: deterministic NEXT-FIT over a sharded corpus.  Docs are
hashed to ``n_shards`` shards; within a shard they are packed in id
order with the rule

    new bin  <=>  fill + n_tokens > capacity

(the first doc of a shard opens bin 0; an oversized doc always gets a
bin of its own).  Next-fit is the packing the big training stacks run
(GPT-NeoX, T5, LLM.int8 dataloaders): first-fit-decreasing packs ~2-5 %
denser but needs global state per bin — next-fit needs only the running
fill, which is why it streams.

Scale shape: ``groupBy(shard).applyInPandas`` — the shard is the unit of
parallelism (pick n_shards >= cluster cores at 100 TB), the per-shard
fold is a single O(rows) pass over int64 numpy arrays, and nothing
shuffles except the one hash partition on shard.  The fold is
inherently sequential per shard (each bin boundary depends on the fill
before it), so the knob for more parallelism is more shards, never a
bigger per-task loop.

The rule above is intentionally expressible as a recursive CTE, so the
driver oracle replays packing EXACTLY in SQL (see __spark_entry__).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK_SCHEMA = "shard int, doc_id long, n_tokens long, bin_id long"


def _pack_kernel(capacity: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        n = pdf["n_tokens"].to_numpy(np.int64)
        bins = np.empty(len(n), dtype=np.int64)
        bin_id, fill = 0, None
        for i, t in enumerate(n.tolist()):
            if fill is None:
                fill = t
            elif fill + t > capacity:
                bin_id += 1
                fill = t
            else:
                fill += t
            bins[i] = bin_id
        out = pdf[["shard", "doc_id", "n_tokens"]].copy()
        out["bin_id"] = bins
        return out

    return fn


def pack_documents(
    docs: DataFrame,
    token_col: str = "n_tokens",
    capacity: int = 2048,
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Assign each doc a (shard, bin_id): deterministic next-fit packing
    in ``id_col`` order within ``id mod n_shards`` shards.

    Input needs ``id_col`` and ``token_col``; returns
    (shard, doc_id, n_tokens, bin_id).
    """
    if capacity <= 0:
        raise ValueError("pack_documents: capacity must be > 0")
    if n_shards <= 0:
        raise ValueError("pack_documents: n_shards must be > 0")
    base = docs.select(
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    return base.groupBy("shard").applyInPandas(_pack_kernel(capacity), _PACK_SCHEMA)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-bin stats over :func:`pack_documents` output: doc count,
    token fill, and utilization (fill/capacity, rounded; >1 only for a
    single oversized doc)."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("fill_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(capacity)), 4).alias("utilization"),
    )


def packing_mix_audit(
    packed: DataFrame,
    doc_meta: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document leakage audit over packed context windows: when
    a training dataloader packs multiple documents into one sequence,
    attention flows across document boundaries unless masked — windows
    mixing SOURCES are where that contamination is least benign (the
    concern behind T5's pack-and-mask and Llama-style document
    attention masks; Zhao et al., "Analysing the Impact of Sequence
    Composition on Language Model Pre-Training", ACL 2024 measure it).

    Joins :func:`pack_documents` output with per-doc metadata and
    reports ONE summary row: (n_bins, n_mixed_bins, frac_mixed,
    avg_docs_per_bin, avg_sources_per_bin).  Shape: one doc-keyed join
    (rides the packing's own shard key), one (shard, bin) aggregate,
    one global reduce."""
    per_bin = (
        packed.join(doc_meta.select(id_col, group_col), id_col)
        .groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(group_col).alias("n_sources"),
        )
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum((F.col("n_sources") > 1).cast("int"))
        .cast("long")
        .alias("n_mixed_bins"),
        F.round(
            F.avg((F.col("n_sources") > 1).cast("int")), 6
        ).alias("frac_mixed"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs_per_bin"),
        F.round(F.avg("n_sources"), 6).alias("avg_sources_per_bin"),
    )


def padding_audit(
    docs: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Training-batch padding-waste audit — arrival-order batching vs
    length-sorted batching (the bucketing-by-sequence-length trick
    every LLM dataloader ships; cf. the batching discussion in
    Ott et al., "fairseq", NAACL 2019 demo, and the packing family
    above).  Padded batches burn compute on pad tokens: a batch of
    ``batch_size`` sequences costs batch_size · max_len slots, so

        padding_frac = 1 − real_tokens / padded_slots

    Strategies compared on identical data: ``arrival`` (batch by
    ``id_col`` order — the naive shuffle-free loader) and ``sorted``
    (batch by (length, id) order — near-homogeneous batches).  One row
    per strategy: (strategy, n_batches, real_tokens, padded_slots,
    padding_frac).

    Scale shape: global sequence numbers come from the range-partition
    + offset-join rank (``index/reorder.py:assign_ids`` — no
    single-partition window); everything else is two hash aggregates.
    """
    from tokenkit_spark.index.reorder import assign_ids

    lens = docs.select(
        id_col,
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("n_tokens"),
    )
    out = None
    for strategy, order_cols in (
        ("arrival", [id_col]),
        ("sorted", ["n_tokens", id_col]),
    ):
        ids = assign_ids(lens, order_cols, id_col=id_col)
        batched = lens.join(ids, id_col).select(
            "n_tokens", (F.col("new_id") / batch_size).cast("long").alias("b")
        )
        per_batch = batched.groupBy("b").agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tokens").alias("real"),
            F.max("n_tokens").alias("mx"),
        )
        row = per_batch.agg(
            F.lit(strategy).alias("strategy"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("real").cast("long").alias("real_tokens"),
            F.sum(F.col("mx") * F.col("n_seqs")).cast("long").alias(
                "padded_slots"
            ),
            F.round(
                1.0 - F.sum("real") / F.sum(F.col("mx") * F.col("n_seqs")),
                round_digits,
            ).alias("padding_frac"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def truncation_loss(
    docs: DataFrame,
    context_lens: tuple = (128, 512, 2048),
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Context-length truncation-loss audit — the question every
    training-data pipeline answers before picking max_seq_len (and the
    reason the packing ops above exist: packing rescues the SHORT tail,
    truncation silently eats the LONG one; cf. the sequence-length
    analyses in Raffel et al. 2020 §3.1.2).

    For each candidate context length L and each source: docs over L,
    total tokens, tokens surviving ``least(n_tokens, L)``, and the
    lost fraction.  One row per (source, context_len).

    Pure Catalyst: token counts once, a literal explode over the L
    candidates, one hash aggregate — no UDFs, one shuffle on the
    (source, L) key."""
    lens = docs.select(
        F.col(source_col).alias("source"),
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("n_tokens"),
    )
    ls = F.explode(
        F.array(*[F.lit(int(l)) for l in context_lens])
    ).alias("context_len")
    e = lens.select("source", "n_tokens", ls)
    return e.groupBy("source", "context_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_tokens") > F.col("context_len")).cast("int"))
        .cast("long")
        .alias("docs_truncated"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        F.sum(
            F.greatest(F.col("n_tokens") - F.col("context_len"), F.lit(0))
        )
        .cast("long")
        .alias("tokens_lost"),
        F.round(
            F.sum(
                F.greatest(F.col("n_tokens") - F.col("context_len"), F.lit(0))
            )
            / F.sum("n_tokens"),
            round_digits,
        ).alias("loss_frac"),
    )
