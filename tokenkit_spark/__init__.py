"""tokenkit_spark — a PySpark-native text-analysis + inverted-index / BM25
query engine with the query and data-processing capabilities of
scientist-labs/tokenkit, re-expressed Spark-first.

Layers:
  config        — frozen AnalyzerConfig (validation, defaults, regex wire format)
  analyzers     — the 13 tokenization strategies + preserve-patterns engine
  functions     — Spark Column functions: native fast paths + pandas UDFs
  index         — inverted-index build (postings, segments, codec) + BM25 query
  sources       — pages corpus (Iceberg/parquet adapter) + synthetic generator
  ops           — dedup, similarity search, text analysis, multimodal plumbing
"""

from .config import AnalyzerConfig, ConfigError, DEFAULTS
from .analyzers.core import (
    Analyzer,
    configure,
    current_config,
    get_analyzer,
    reset,
    tokenize,
)

__version__ = "0.1.0"

__all__ = [
    "AnalyzerConfig",
    "ConfigError",
    "DEFAULTS",
    "Analyzer",
    "configure",
    "current_config",
    "get_analyzer",
    "reset",
    "tokenize",
]
