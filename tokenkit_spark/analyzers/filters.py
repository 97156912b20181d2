"""Token filter chains: stopword removal + Porter stemming, with
preserve-pattern exemption.

north_star: "lowercase/stopword/stemming filter chains preserving gene
names, measurements and technical terms". The tokenizers (core.py)
already own lowercase/remove_punctuation/preserve_patterns exactly as
the reference does; this layer adds the two filters the reference
positions downstream (README.md:509-553 index-time analysis) as a
composable chain over token arrays.

Exemption contract: a token that fully matches any preserve pattern is
passed through verbatim — not dropped as a stopword, not stemmed — so
``BRCA1``, ``100ug``, ``Anti-CD3`` survive a chain that stems the rest.

Spark execution: ``filter_chain_col`` uses a native Catalyst expression
for the stopword-only chain (stays in WholeStageCodegen) and an Arrow
pandas UDF when stemming or preserve patterns are involved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..config import compile_pattern, to_inline_pattern
from .stem import porter_stem

# Lucene/Snowball's classic 33-word English stop set (public domain)
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)


@dataclass(frozen=True)
class FilterChain:
    """Declarative filter chain applied AFTER tokenization."""

    stopwords: frozenset[str] = frozenset()
    stem: bool = False
    preserve_patterns: tuple[str, ...] = ()

    def __post_init__(self):
        object.__setattr__(
            self,
            "preserve_patterns",
            tuple(to_inline_pattern(p) for p in self.preserve_patterns),
        )

    def key(self) -> tuple:
        return (tuple(sorted(self.stopwords)), self.stem, self.preserve_patterns)

    def compile(self):
        """-> callable(list[str]) -> list[str]."""
        pats = [compile_pattern(p) for p in self.preserve_patterns]
        stop = self.stopwords
        stem = self.stem

        def _preserved(tok: str) -> bool:
            return any(p.fullmatch(tok) for p in pats)

        def apply(tokens):
            if tokens is None:
                return None
            out = []
            for t in tokens:
                if pats and _preserved(t):
                    out.append(t)
                    continue
                if stop and t in stop:
                    continue
                out.append(porter_stem(t) if stem else t)
            return out

        return apply


def filter_chain_col(tokens_col, chain: FilterChain) -> Column:
    """Apply a FilterChain to an ``array<string>`` column."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if not chain.stem and not chain.preserve_patterns:
        if not chain.stopwords:
            return c
        # native path: array_contains against a literal array is
        # codegen'd JVM-side; order + duplicates preserved (unlike
        # array_except, which dedups)
        stop_arr = F.array(*[F.lit(s) for s in sorted(chain.stopwords)])
        return F.filter(c, lambda t: ~F.array_contains(stop_arr, t))

    key = chain.key()

    def _udf(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = FilterChain(frozenset(key[0]), key[1], key[2]).compile()
        for series in batch_iter:
            yield series.map(fn)

    return F.pandas_udf(_udf, ArrayType(StringType()))(c)
