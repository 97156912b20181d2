"""HTML outlink extraction + RFC 3986 reference resolution — the WAT
step of a Common-Crawl-style pipeline (the reference corpus's pages
carry ``html:binary``; the link graph every op in ops/linkgraph.py
consumes is what this produces in production).

``extract_outlinks`` is pure Catalyst: one ``regexp_extract_all`` for
anchor tags, per-tag ``regexp_extract`` for href/anchor text, and a
closed-form resolution of the href against the page URL covering the
reference-resolution cases a crawler meets (RFC 3986 §5.2 subset):

* absolute (``scheme://...``) — kept as-is;
* protocol-relative (``//host/path``) — base scheme prepended;
* root-relative (``/path``) — scheme://host prepended;
* relative (``path``) — resolved against the base directory (the
  base URL up to its last ``/``); no ``..`` normalization (the
  synthetic corpus emits none; a production crawler normalizes dot
  segments in the frontier's canonicalization step — see
  sources/cdx.py:surt_key, which already collapses equivalent forms);
* fragments are stripped (``#...`` never reaches the frontier);
* non-fetchable schemes (``mailto:``, ``javascript:``, ``data:``,
  ``tel:``) are dropped.

``rel="nofollow"`` is surfaced as a flag, not filtered — frontier
policy decides (RFC 9309 robots rules are a separate gate,
ops/robots.py).

Scale shape: one explode over per-page anchor tags (bounded by page
size), all string work inside whole-stage codegen — the map-side step
of the WAT job; the downstream groupBy(dst) is the link-graph build.

The regex contract assumes double-quoted hrefs and non-nested anchor
bodies — true of the synthetic corpus and stated here so the
production swap (an HTML5 parser behind the same schema) is a
drop-in; the schema, resolution, and nofollow semantics are the
stable surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_A_TAG = r'<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'
_SKIP_SCHEMES = r"^(mailto:|javascript:|data:|tel:)"


def extract_outlinks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, href, resolved_url, anchor_text, nofollow) — one row
    per anchor tag with a fetchable href; see module doc for the
    resolution contract."""
    html_str = F.decode(F.col(html_col), "utf-8")
    tags = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.regexp_extract_all(html_str, F.lit(_A_TAG), 0)).alias(
            "tag"
        ),
    )
    parsed = tags.select(
        "src_url",
        F.regexp_extract("tag", r'href="([^"]*)"', 1).alias("href_raw"),
        F.regexp_extract("tag", r">([^<]*)</a>", 1).alias("anchor_text"),
        F.col("tag").rlike(r'rel="[^"]*nofollow[^"]*"').alias("nofollow"),
    ).withColumn(
        # strip fragment before resolution — RFC 3986: the fragment is
        # not sent to the server and never distinguishes frontier URLs
        "href",
        F.regexp_replace("href_raw", r"#.*$", ""),
    )

    scheme = F.regexp_extract("src_url", r"^([a-z][a-z0-9+.-]*):", 1)
    host_part = F.regexp_extract("src_url", r"^[a-z][a-z0-9+.-]*://([^/]*)", 1)
    base_dir = F.regexp_extract("src_url", r"^(.*/)[^/]*$", 1)

    resolved = (
        F.when(F.col("href") == "", F.col("src_url"))  # same-document ref
        .when(F.col("href").rlike(r"^[a-z][a-z0-9+.-]*://"), F.col("href"))
        .when(
            F.col("href").startswith("//"),
            F.concat(scheme, F.lit(":"), F.col("href")),
        )
        .when(
            F.col("href").startswith("/"),
            F.concat(scheme, F.lit("://"), host_part, F.col("href")),
        )
        .otherwise(F.concat(base_dir, F.col("href")))
    )
    return (
        parsed.filter(
            (F.col("href_raw") != "")
            & ~F.col("href").rlike(_SKIP_SCHEMES)
        )
        .select(
            "src_url",
            F.col("href_raw").alias("href"),
            resolved.alias("resolved_url"),
            "anchor_text",
            "nofollow",
        )
    )


def link_rel_mix(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
) -> DataFrame:
    """Outlink rel-attribute mix — the 2019 link-annotation taxonomy.

    Google's sponsored/ugc split of nofollow (announced Sept 2019,
    rels became "hints") made the per-host rel mix a signal twice
    over: how a host qualifies its links, and how much of its
    outlink graph a PageRank-style computation should discount.
    Anchor-level counts: qualified rels vs plain links.

    Per host: (host, n_anchors, n_nofollow, n_sponsored, n_ugc,
    n_plain, n_qualified) — integer counts only (the qualified share
    is n_qualified / n_anchors), so the audit hashes identically on
    every engine.
    """
    t = F.lower(F.col(html_col))
    anchors = F.regexp_count(t, F.lit("<a "))
    nof = F.regexp_count(t, F.lit('<a [^>]*rel="[^"]*nofollow'))
    spo = F.regexp_count(t, F.lit('<a [^>]*rel="[^"]*sponsored'))
    ugc = F.regexp_count(t, F.lit('<a [^>]*rel="[^"]*ugc'))
    qual = F.regexp_count(
        t,
        F.lit('<a [^>]*rel="[^"]*(nofollow|sponsored|ugc)'),
    )
    per = pages.select(
        F.col(host_col).alias("host"),
        anchors.alias("a"),
        nof.alias("nf"),
        spo.alias("sp"),
        ugc.alias("ug"),
        qual.alias("q"),
    )
    return per.groupBy("host").agg(
        F.sum("a").alias("n_anchors"),
        F.sum("nf").alias("n_nofollow"),
        F.sum("sp").alias("n_sponsored"),
        F.sum("ug").alias("n_ugc"),
        (F.sum("a") - F.sum("q")).alias("n_plain"),
        F.sum("q").alias("n_qualified"),
    )
