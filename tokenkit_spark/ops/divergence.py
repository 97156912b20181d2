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


PSI_BANDS = ((0.1, "stable"), (0.25, "moderate_drift"))


def psi_drift(
    events: DataFrame,
    split_ts: str,
    bin_width: float = 50.0,
    n_bins: int = 10,
    value_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Population Stability Index between pre/post value distributions.

    The PSI is the credit-scoring industry's standard drift metric
    (Siddiqi, "Credit Risk Scorecards", 2006) — the symmetrized KL
    divergence over FIXED bins:

        PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

    with p the post-period bin shares, q the pre-period shares, and
    the conventional read: < 0.1 stable, < 0.25 moderate drift, else
    major drift (retrain/investigate).  Bins are PINNED (fixed width,
    last bin open-ended) — data-dependent quantile bins would make
    the metric incomparable across runs, the exact mistake the fixed
    banding avoids.  Zero-share bins take the usual 1e-6 floor so the
    log stays finite on both engines.

    One row per group: (grp, n_pre, n_post, psi, drift_level).
    Scale shape: one projection to (group, bin, period), two hash
    aggregates, a bins x groups grid join — nothing row-scale after
    the first rollup.
    """
    split = F.lit(split_ts).cast("timestamp")
    binned = events.select(
        F.col(group_col).alias("grp"),
        F.when(F.col(ts_col) < split, "pre").otherwise("post").alias(
            "period"
        ),
        F.least(
            F.lit(n_bins - 1),
            F.floor(F.col(value_col) / bin_width).cast("long"),
        ).alias("bin"),
    )
    per = binned.groupBy("grp", "period", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = binned.groupBy("grp", "period").agg(
        F.count(F.lit(1)).alias("n")
    )
    bins = events.sparkSession.range(n_bins).select(
        F.col("id").alias("bin")
    )
    grid = (
        tot.select("grp", "period", "n")
        .crossJoin(F.broadcast(bins))
        .join(per, ["grp", "period", "bin"], "left")
        .na.fill({"c": 0})
        .select(
            "grp",
            "period",
            "bin",
            F.greatest(
                F.col("c") / F.col("n"), F.lit(1e-6)
            ).alias("share"),
        )
    )
    wide = (
        grid.groupBy("grp", "bin")
        .agg(
            F.max(
                F.when(F.col("period") == "pre", F.col("share"))
            ).alias("q"),
            F.max(
                F.when(F.col("period") == "post", F.col("share"))
            ).alias("p"),
        )
        .na.fill({"q": 1e-6, "p": 1e-6})
    )
    psi = wide.groupBy("grp").agg(
        F.sum(
            (F.col("p") - F.col("q"))
            * F.log(F.col("p") / F.col("q"))
        ).alias("psi_raw")
    )
    counts = tot.groupBy("grp").agg(
        F.max(F.when(F.col("period") == "pre", F.col("n"))).alias(
            "n_pre"
        ),
        F.max(F.when(F.col("period") == "post", F.col("n"))).alias(
            "n_post"
        ),
    )
    level = (
        F.when(F.col("psi_raw") < PSI_BANDS[0][0], PSI_BANDS[0][1])
        .when(F.col("psi_raw") < PSI_BANDS[1][0], PSI_BANDS[1][1])
        .otherwise("major_drift")
    )
    return counts.join(psi, "grp").select(
        "grp",
        "n_pre",
        "n_post",
        F.round("psi_raw", round_digits).alias("psi"),
        level.alias("drift_level"),
    )
