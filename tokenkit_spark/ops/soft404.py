"""Soft-404 detection signals — pages that return HTTP 200 but are
really error pages (Bar-Yossef, Broder, Kumar & Tomkins, "Sic transit
gloria telae: towards an understanding of the web's decay", WWW 2004,
who showed soft 404s dominate dead-link measurements and detect them
by probing random sibling URLs and comparing content).

A batch pipeline sees the whole host at once, so the probe becomes an
aggregate: error templates are (a) textually error-like (the phrase
battery below) and (b) *shared verbatim across many URLs of the host*
(the random-probe insight — a host's soft-404 template is the page you
get for every bad URL).  Signals per host:

* phrase-hit share — pages matching the error-phrase battery,
* duplicate-title mass — share of pages whose title is shared by >=
  ``dup_min`` pages of the same host (template pages cluster),
* the page-level conjunction (phrase hit AND templated title) — the
  high-precision soft-404 verdict.

Shape: one codegen regexp per page, a (host, title) count aggregate
joined back on the same key, one host rollup.  No UDFs, no driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ERROR_PHRASES = (
    r"(page not found|could not be found|404 error|no longer available"
    r"|does not exist)"
)


def soft404_signals(
    pages: DataFrame,
    host_col: str = "host",
    title_col: str = "title",
    text_col: str = "text",
    dup_min: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """One row per host: (host, n_pages, n_phrase, frac_phrase,
    n_templated, n_soft404, frac_soft404)."""
    p = pages.withColumn(
        "_hit", F.lower(F.col(text_col)).rlike(ERROR_PHRASES)
    )
    tcount = p.groupBy(host_col, title_col).agg(
        F.count(F.lit(1)).alias("_tn")
    )
    j = p.join(tcount, [host_col, title_col]).withColumn(
        "_templated", F.col("_tn") >= dup_min
    )
    return j.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col("_hit").cast("int")).cast("long").alias("n_phrase"),
        F.round(F.avg(F.col("_hit").cast("int")), round_digits).alias(
            "frac_phrase"
        ),
        F.sum(F.col("_templated").cast("int"))
        .cast("long")
        .alias("n_templated"),
        F.sum((F.col("_hit") & F.col("_templated")).cast("int"))
        .cast("long")
        .alias("n_soft404"),
        F.round(
            F.avg((F.col("_hit") & F.col("_templated")).cast("int")),
            round_digits,
        ).alias("frac_soft404"),
    )
