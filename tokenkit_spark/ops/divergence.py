"""Corpus divergence between sources: KL and Jensen-Shannon over
unigram distributions.

Training-mix curation needs a distance between corpus slices: how far
is source A's language from source B's? The standard instruments are
the smoothed unigram KL divergence (asymmetric — "how surprised is a
model of B by text from A") and the Jensen-Shannon divergence (its
symmetric, bounded companion; Lin 1991). Data-selection pipelines use
exactly these to pick mixture weights and to detect drift between crawl
snapshots (DSIR's importance weights — ops/dsir.py — are the per-doc
refinement of the same unigram-LM view).

Additive smoothing with alpha over the UNION vocabulary V gives both
distributions full support, so every sum is finite:

    p_g(t) = (c_{g,t} + alpha) / (n_g + alpha * |V|)
    KL(a||b) = sum_t p_a(t) * ln(p_a(t) / p_b(t))        [nats]
    JSD(a,b) = 0.5 * KL(a||m) + 0.5 * KL(b||m),  m = (p_a + p_b) / 2

Scale shape: one tokenize + hash-agg pass to (group, term) counts —
corpus-linear, map-side combinable — then everything runs on
vocabulary-sized relations: a groups x V grid (smoothing needs the
zero cells) and a pairwise join on term. Sources are few (a mixture has
tens of components, not millions), so the pair count is trivial; the
vocabulary join is the only real shuffle and it is |V|-bounded, not
corpus-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_divergence(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    alpha: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise (group_a < group_b) smoothed unigram divergences.
    Returns (source_a, source_b, vocab_size, kl_ab, kl_ba, jsd) —
    KL/JSD in nats, rounded."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    counts = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("grp").agg(F.sum("c").alias("n"))
    vocab = counts.select("term").distinct()
    v_size = vocab.agg(F.count(F.lit(1)).alias("v"))
    # groups x vocab grid with smoothed probabilities (zero cells too)
    grid = (
        totals.crossJoin(vocab)
        .join(counts, ["grp", "term"], "left")
        .crossJoin(F.broadcast(v_size))
        .select(
            "grp",
            "term",
            "v",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.col("n") + F.lit(alpha) * F.col("v"))
            ).alias("p"),
        )
    )
    a = grid.select(
        F.col("grp").alias("source_a"),
        "term",
        F.col("v").alias("vocab_size"),
        F.col("p").alias("pa"),
    )
    bb = grid.select(
        F.col("grp").alias("source_b"), "term", F.col("p").alias("pb")
    )
    pairs = a.join(bb, "term").filter(F.col("source_a") < F.col("source_b"))
    m = (F.col("pa") + F.col("pb")) / 2.0
    return (
        pairs.groupBy("source_a", "source_b", "vocab_size")
        .agg(
            F.round(
                F.sum(F.col("pa") * F.log(F.col("pa") / F.col("pb"))),
                round_digits,
            ).alias("kl_ab"),
            F.round(
                F.sum(F.col("pb") * F.log(F.col("pb") / F.col("pa"))),
                round_digits,
            ).alias("kl_ba"),
            F.round(
                F.sum(
                    0.5 * F.col("pa") * F.log(F.col("pa") / m)
                    + 0.5 * F.col("pb") * F.log(F.col("pb") / m)
                ),
                round_digits,
            ).alias("jsd"),
        )
        .orderBy("source_a", "source_b")
    )
