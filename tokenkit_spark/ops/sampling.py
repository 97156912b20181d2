"""Deterministic stratified sampling for training-mix construction —
"give me 30% web, 50% wiki, 20% code, reproducibly" is the last step of
every pre-training data pipeline (the Pile / ROOTS / Dolma mixture
recipes all sample per-source with fixed rates).

Sampling decision: keep a row iff frac(id) < rate[stratum], where
frac(id) = first-8-hex-digits of md5(id || salt) / 2^32 — a per-row
cryptographic hash, NOT an RNG:

- deterministic and engine-independent (Spark `md5`/`conv` and DuckDB
  `md5`/hex-cast produce the SAME fraction, so the correctness oracle
  replays the exact sample; a re-run, a resumed job, or a different
  cluster size selects the SAME rows — no partition-seeded
  `df.sample()` nondeterminism);
- a pure map-side filter: no shuffle, no state, pushes down past
  column pruning, scales embarrassingly;
- salt gives independent resamples (epochs, ablations) without
  correlation between them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_fraction_col(id_col: str, salt: str = "") -> Column:
    """Deterministic [0, 1) fraction per id: md5 prefix as uniform bits.
    Column must stringify stably (int/str ids)."""
    s = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("double")
        / F.lit(float(2**32))
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Rows of ``docs`` kept with per-stratum probability ``rates``
    (strata missing from ``rates`` are dropped entirely — rate 0).
    Pure map-side filter; row order and schema unchanged."""
    if not rates:
        return docs.filter(F.lit(False))
    mapping = F.create_map(
        *[F.lit(x) for k, v in rates.items() for x in (k, float(v))]
    )
    rate = F.coalesce(mapping[F.col(strata_col)], F.lit(0.0))
    return docs.filter(sample_fraction_col(id_col, salt) < rate)


def mix_rates(
    docs: DataFrame,
    target_props: dict[str, float],
    total: int,
    strata_col: str = "source",
) -> dict[str, float]:
    """Per-stratum keep rates that hit a ``total``-row mixture with
    proportions ``target_props`` (values sum to <= 1), capped at 1.0
    when a stratum can't supply its share (the standard
    undersupply-capping rule; re-normalize upstream if exact totals
    matter more than proportions). One tiny aggregate (#strata rows)
    collects to the driver."""
    counts = {
        r.s: r.n
        for r in docs.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        s: min(1.0, (p * total) / counts[s])
        for s, p in target_props.items()
        if counts.get(s)
    }


def exact_k_sample(
    docs: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum: rank rows inside each
    stratum by the deterministic md5 fraction (id tiebreak) and keep
    rank <= k — reservoir sampling's guarantee without its sequential
    reservoir, deterministic across reruns and cluster sizes.

    Scale shape: one shuffle on the stratum key + a rank window; only k
    rows per stratum survive the filter.  A stratum is the unit of
    parallelism — when one stratum dominates the corpus, pre-split it
    with a salted sub-stratum and take k/n per split."""
    if k <= 0:
        raise ValueError("exact_k_sample: k must be > 0")
    w = Window.partitionBy(strata_col).orderBy(
        sample_fraction_col(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def temperature_rates(
    docs: DataFrame,
    stratum_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based mixture rates (the multilingual-LLM standard:
    p_i ∝ n_i^alpha, alpha<1 UP-samples small sources relative to their
    natural share). Returns one row per stratum: (stratum, n, natural_p,
    temp_p, boost) where boost = temp_p / natural_p is the per-stratum
    sampling multiplier a pipeline feeds into stratified_sample (rates
    scaled so max boost = 1 keeps everything sub-sampled, never
    duplicated). One count aggregate + an O(#strata) normalization —
    the big table is touched once."""
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.sum("n").alias("tot_n"),
        F.sum(F.pow(F.col("n").cast("double"), F.lit(alpha))).alias("tot_p"),
    )
    out = counts.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        "n",
        (F.col("n") / F.col("tot_n")).alias("natural_p"),
        (F.pow(F.col("n").cast("double"), F.lit(alpha)) / F.col("tot_p")).alias("temp_p"),
    )
    return out.withColumn("boost", F.col("temp_p") / F.col("natural_p"))


def deterministic_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    rank_partitions: int | None = None,
) -> DataFrame:
    """Reproducible corpus-order shuffle for training: order rows by the
    keyed hash frac(id || seed) — the same rows land in the same order
    on ANY cluster size, any partitioning, any resume point (unlike
    df.orderBy(rand()) whose seed is per-partition). A different seed
    string is a fresh epoch permutation.

    Returns docs + (shuffle_key double). The caller writes
    ``.repartitionByRange(N, 'shuffle_key').sortWithinPartitions(...)``
    — a range-partitioned sort, never a single-partition window; the
    key itself is the total order."""
    return docs.withColumn("shuffle_key", sample_fraction_col(id_col, seed))


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
    round_digits: int = 10,
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement, one pass, no
    reservoir (Efraimidis & Spirakis, "Weighted random sampling with a
    reservoir", IPL 2006, algorithm A-ES): give each row the key

        key_i = u_i ^ (1 / w_i),   u_i ~ U(0, 1)

    and keep the k largest keys — provably equivalent to sequential
    weighted draws without replacement. u_i here is the deterministic
    md5 fraction (module doc), so the "random" sample is reproducible
    across reruns, engines, and cluster sizes, and the whole operator
    is a map-side projection + a top-k (`orderBy ... limit`, partial
    top-k per partition — never a full sort at scale). Rows with
    weight <= 0 are excluded (they can never be drawn).

    Returns (id_col, weight_col, es_key) for the k sampled rows."""
    if k <= 0:
        raise ValueError("weighted_sample: k must be positive")
    u = sample_fraction_col(id_col, salt)
    # guard u=0 (key would be 0 regardless of weight): md5 fraction is
    # 0 with probability 2^-32; nudge into (0, 1)
    u = F.greatest(u, F.lit(2.0 ** -33))
    key = F.round(
        F.pow(u, 1.0 / F.col(weight_col)), round_digits
    ).alias("es_key")
    return (
        docs.filter(F.col(weight_col) > 0)
        .select(id_col, weight_col, key)
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def unimax_allocation(
    docs: DataFrame,
    max_epochs: float = 3.0,
    budget_ratio: float = 1.2,
    lang_col: str = "lang",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """UniMax language sampling (Chung, Garcia, Roberts et al.,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining", ICLR 2023): spread a token
    budget B = ``budget_ratio`` * total corpus tokens as uniformly as
    possible across languages, capping each language at ``max_epochs``
    passes over its corpus — the closed-form waterfill.

    With per-language token counts c_l and caps cap_l = max_epochs*c_l
    sorted ascending, the water level is L* = (B - sum of the caps
    that bind) / (#languages above the level); computed relationally:
    candidate level L_i = (B - prefix_i) / (n - i + 1) at each sort
    position, and L* = max over the FEASIBLE candidates (L_i <=
    cap_i) — feasibility is monotone down the sort, so the first
    feasible candidate is the maximum. alloc_l = min(cap_l, L*); if
    B >= sum(caps) every language is capped.

    Scale shape: one token-count aggregate over the corpus (map-side
    partial), then all window arithmetic runs on the languages-sized
    relation — a few hundred rows no matter the corpus size.

    Returns per language: n_tokens, cap_tokens, alloc_tokens, epochs
    (alloc/corpus), share (alloc/B), ordered by language.
    """
    toks = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
    )
    c = (
        docs.select(F.col(lang_col).alias("lang"), toks.alias("t"))
        .groupBy("lang")
        .agg(F.sum("t").alias("n_tokens"))
    )
    cap = (F.col("n_tokens") * F.lit(float(max_epochs))).alias("cap")
    w = Window.orderBy("cap", "lang")
    rows = (
        c.select("lang", "n_tokens", cap)
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "prefix",
            F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
        .withColumn("n", F.count("*").over(Window.orderBy(F.lit(1))))
        .withColumn(
            "total", F.sum("n_tokens").over(Window.orderBy(F.lit(1)))
        )
        .withColumn("budget", F.col("total") * F.lit(float(budget_ratio)))
        .withColumn(
            "cand",
            (F.col("budget") - F.col("prefix"))
            / (F.col("n") - F.col("i") + 1),
        )
    )
    level = rows.agg(
        F.max(
            F.when(F.col("cand") <= F.col("cap"), F.col("cand"))
        ).alias("level")
    )
    alloc = F.least(
        F.col("cap"), F.coalesce(F.col("level"), F.col("cap"))
    )
    return (
        rows.crossJoin(F.broadcast(level))
        .select(
            "lang",
            "n_tokens",
            F.round("cap", round_digits).alias("cap_tokens"),
            F.round(alloc, round_digits).alias("alloc_tokens"),
            F.round(alloc / F.col("n_tokens"), round_digits).alias("epochs"),
            F.round(alloc / F.col("budget"), round_digits).alias("share"),
        )
        .orderBy("lang")
    )
