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
