"""Vectorized Spark column functions for the analyzers.

Two interchangeable paths (kept semantically identical; tested against each
other):

* ``tokenize_udf(config)`` — an Arrow-batched ``pandas_udf`` running the
  compiled analyzer per batch. The analyzer is memoized per executor
  process keyed by the frozen config (the Spark analog of the reference's
  tokenizer cache, ext/tokenkit/src/lib.rs:12-44): the config tuple is
  serialized into the closure, compilation happens once per worker, not
  per batch and never per row.
* ``native.tokenize_native(col, config)`` — pure Catalyst expressions for
  the strategies SQL can express exactly (whitespace/letter/lowercase/
  keyword/char_group/edge_ngram/ngram, no preserve patterns). These stay
  inside WholeStageCodegen — no Python worker at all.

``tokenize_col`` picks the best path automatically.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..config import AnalyzerConfig
from ..analyzers.core import get_analyzer
from . import native


def tokenize_udf(config: AnalyzerConfig):
    """Build a pandas UDF ``string -> array<string>`` for this config."""
    key = config.key()

    def _tok(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # executor-side: compile once per worker, reuse across batches
        analyzer = get_analyzer(AnalyzerConfig(*key))
        fn = analyzer.tokenize
        for series in batch_iter:
            yield series.map(lambda t: fn(t) if t is not None else None)

    return F.pandas_udf(_tok, ArrayType(StringType()))


def tokenize_col(col, config: AnalyzerConfig | None = None, **overrides) -> Column:
    """Tokenize a string column. Uses the native Catalyst path when the
    config allows (keeps the plan in WholeStageCodegen), else the Arrow
    pandas UDF."""
    cfg = (config or AnalyzerConfig())
    if overrides:
        cfg = cfg.replace(**overrides)
    c = F.col(col) if isinstance(col, str) else col
    if native.supports_native(cfg):
        expr = native.try_tokenize_native(c, cfg)
        if expr is not None:
            return expr
    return tokenize_udf(cfg)(c)
