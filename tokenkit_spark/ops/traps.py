"""Crawl-trap detection signals — the per-host URL-shape heuristics
production crawlers use to avoid infinite URL spaces (Heydon & Najork,
"Mercator: A scalable, extensible Web crawler", WWW 1999 §3.4 discuss
traps; Heritrix ships the same family as PathologicalPathDecideRule /
TooManyPathSegmentsDecideRule / parameter caps).

Calendar pages, session-id echoes and self-linking CGI scripts
generate unbounded URL sets that are individually valid, so traps are
detected from aggregate URL shape per host, not per page:

* very deep paths (segment count past a sane limit),
* repeated path segments (``/a/b/a/b/a`` — the pathological-path rule),
* heavy query-parameter use (session ids, sort orders, calendars).

Scale shape: pure Catalyst string/array expressions per URL (split +
array_distinct, whole-stage codegen) and ONE host-keyed hash
aggregate; a 10^11-URL frontier shards on host and never touches a
UDF or the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_shape(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds per-URL shape columns: depth (path segments), has_repeat
    (some path segment occurs twice), n_params (query parameters)."""
    path_q = F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    path = F.element_at(F.split(path_q, r"\?", 2), 1)
    query = F.when(
        F.size(F.split(path_q, r"\?", 2)) > 1,
        F.element_at(F.split(path_q, r"\?", 2), 2),
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return urls.withColumns(
        {
            "depth": F.size(segs),
            "has_repeat": F.size(segs) != F.size(F.array_distinct(segs)),
            "n_params": F.when(query.isNull() | (query == ""), 0).otherwise(
                F.size(F.split(query, "&"))
            ),
        }
    )


def trap_signals(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    depth_limit: int = 6,
    repeat_frac: float = 0.3,
    round_digits: int = 6,
) -> DataFrame:
    """One row per host: (host, n_urls, max_depth, frac_repeat,
    avg_params, trap_suspect).  ``trap_suspect`` fires when the host's
    deepest path exceeds ``depth_limit`` or more than ``repeat_frac``
    of its URLs repeat a path segment — the two Mercator/Heritrix
    kill rules this audit feeds."""
    shaped = url_shape(urls, url_col)
    return (
        shaped.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.max("depth").alias("max_depth"),
            F.round(
                F.avg(F.col("has_repeat").cast("int")), round_digits
            ).alias("frac_repeat"),
            F.round(F.avg("n_params"), round_digits).alias("avg_params"),
        )
        .withColumn(
            "trap_suspect",
            (F.col("max_depth") > depth_limit)
            | (F.col("frac_repeat") > repeat_frac),
        )
    )
