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


PAGE_PARAM_RX = r"([?&])(page|p|start|offset)=(\d+)"
PAGE_PATH_RX = r"/page/(\d+)/?$"


def pagination_families(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """Pagination-family rollup — how much of a host's URL space is
    page-N variants of the same listing.

    The crawl-scheduling counterpart of the trap signals above: deep
    pagination chains (?page=N, /page/N/) are the benign-looking half
    of the "infinite crawl space" problem (Mercator §3.4) — each page
    is fetchable and unique, but value decays fast with N, so
    frontiers cap family depth rather than URL count.  A URL's FAMILY
    key is the URL with its pagination marker stripped (query param
    ``page|p|start|offset`` removed; trailing ``/page/N`` dropped);
    the page NUMBER is the marker's integer (1 when absent).

    Per host: (host, n_urls, n_paginated, n_families, max_family_size,
    max_page_no, frac_paginated).  Pure regexp projections + two hash
    aggregates.
    """
    u = F.col(url_col)
    has_q = u.rlike(PAGE_PARAM_RX)
    has_p = u.rlike(PAGE_PATH_RX)
    family = F.regexp_replace(
        F.regexp_replace(u, PAGE_PARAM_RX, "$1"), PAGE_PATH_RX, "/"
    )
    page_no = (
        F.when(has_q, F.regexp_extract(u, PAGE_PARAM_RX, 3))
        .when(has_p, F.regexp_extract(u, PAGE_PATH_RX, 1))
        .otherwise(F.lit("1"))
        .cast("long")
    )
    per = pages.select(
        F.col(host_col).alias("host"),
        family.alias("family"),
        (has_q | has_p).cast("long").alias("pg"),
        page_no.alias("page_no"),
    )
    fam = per.groupBy("host", "family").agg(
        F.count(F.lit(1)).alias("fam_size"),
        F.max("page_no").alias("fam_max_page"),
    )
    a = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("pg").alias("n_paginated"),
        F.round(F.sum("pg") / F.count(F.lit(1)), round_digits).alias(
            "frac_paginated"
        ),
    )
    b = fam.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_families"),
        F.max("fam_size").alias("max_family_size"),
        F.max("fam_max_page").alias("max_page_no"),
    )
    return a.join(b, "host").select(
        "host", "n_urls", "n_paginated", "n_families",
        "max_family_size", "max_page_no", "frac_paginated",
    )
