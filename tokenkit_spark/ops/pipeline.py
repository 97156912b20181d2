"""Training-corpus cleaning pipeline — the composition layer over the
individual LLM-data ops (C4 / Gopher style: Raffel et al. 2020 §2.2,
Rae et al. 2021 §A1.1).

Stages, all pure Catalyst expressions or partial-agg shuffles (no UDFs,
no collects — the shape that survives 100 TB):

  1. language filter   — stopword-ratio argmax (textstats.detect_language)
  2. quality floor     — composite score from textstats.quality_features
  3. length floor      — minimum whitespace-token count
  4. exact dedup       — sha2(text) groupBy keeping the LOWEST doc_id of
                         each duplicate class (deterministic canonical
                         representative; partial aggregation flattens
                         dup skew before the shuffle)

Every stage is SQL-expressible, so the whole pipeline has an exact
DuckDB oracle twin in __spark_entry__.py (clean_corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import detect_language, quality_features


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    min_tokens: int = 20,
) -> DataFrame:
    """Surviving docs as (doc_id, lang_pred, n_tokens, quality_score).

    The quality filter applies to the ROUNDED (4 dp) score exactly as
    quality_features emits it, so results are reproducible bit-for-bit
    against the SQL oracle at filter boundaries."""
    feats = quality_features(docs, text_col)
    meta = docs.select(
        "doc_id",
        detect_language(F.col(text_col)).alias("lang_pred"),
        F.sha2(F.col(text_col), 256).alias("_h"),
    )
    kept = (
        feats.join(meta, "doc_id")
        .filter(
            F.col("lang_pred").isin(list(langs))
            & (F.col("quality_score") >= F.lit(min_quality))
            & (F.col("n_tokens") >= F.lit(min_tokens))
        )
    )
    canon = kept.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    return (
        kept.join(canon.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "lang_pred", "n_tokens", "quality_score")
    )


def build_training_mix(
    docs: DataFrame,
    rates: dict[str, float],
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    min_tokens: int = 20,
    max_ppl: float | None = None,
    alpha: float = 0.1,
    salt: str = "mix",
) -> DataFrame:
    """The whole pre-training data pipeline as ONE declarative pass:

      1. ``clean_corpus``  — lang / quality / length floors + exact dedup
      2. perplexity cap    — bigram LM TRAINED ON THE SURVIVORS of (1)
                             (CCNet ordering: dedup before LM so dup
                             boilerplate can't dominate the model), keep
                             ppl <= ``max_ppl``
      3. ``stratified_sample`` — deterministic per-source mixture rates

    Returns (doc_id, source, lang_pred, n_tokens, quality_score, ppl,
    kept) — one row per stage-2 survivor, ``kept`` marking the stage-3
    sample decision, so mixture audits (kept vs available per source)
    fall out of the same frame. Docs with < 2 tokens (possible only
    when ``min_tokens`` < 2) have no bigrams: their ``ppl`` is NULL and
    the ``max_ppl`` cap does not drop them (no LM evidence).

    Scale shape: stage boundaries are left_semi joins on doc_id (never
    rewidening), the LM is count tables (no collected state), sampling
    is a map-side hash filter. Everything is SQL-expressible, so the
    driver holds an exact end-to-end DuckDB oracle (``training_mix``).
    """
    from .sampling import sample_fraction_col
    from .textstats import bigram_lm_perplexity

    kept = clean_corpus(docs, text_col, langs, min_quality, min_tokens)
    survivors = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    ppl = bigram_lm_perplexity(survivors, alpha=alpha, text_col=text_col).select(
        "doc_id", "ppl"
    )
    staged = (
        kept.join(ppl, "doc_id", "left")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    if max_ppl is not None:
        # a doc with < 2 tokens has no bigrams -> ppl NULL: the LM has
        # no evidence against it, so the cap does NOT drop it (only
        # reachable when min_tokens < 2)
        staged = staged.filter(
            (F.col("ppl") <= F.lit(max_ppl)) | F.col("ppl").isNull()
        )
    mapping = F.create_map(
        *[F.lit(x) for k, v in rates.items() for x in (k, float(v))]
    )
    rate = F.coalesce(mapping[F.col("source")], F.lit(0.0))
    return staged.select(
        "doc_id", "source", "lang_pred", "n_tokens", "quality_score", "ppl",
        (sample_fraction_col("doc_id", salt) < rate).alias("kept"),
    )
