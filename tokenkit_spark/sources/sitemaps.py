"""sitemap.xml / sitemapindex parsing (sitemaps.org protocol).

A crawl frontier's seed expansion: 10^8 hosts each publish a sitemap
(urlset of <url><loc/><lastmod/><changefreq/><priority/></url>) or a
sitemapindex pointing at more sitemaps. At scale this is a text-scan +
projection problem, not a DOM problem: each <url> element is
independent, so the parse is `explode(split(body, '</url>'))` +
per-fragment `regexp_extract` — pure Catalyst, alignment-safe even when
optional fields (lastmod, priority) are present on some entries and not
others (a positional xpath zip would misalign them), and it streams —
no document ever needs to be materialized as a tree.

Malformed entries (no <loc>) drop; entity-encoded ampersands in locs
(&amp; — required by the protocol) are decoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frag_field(tag: str):
    return F.regexp_extract("frag", rf"<{tag}[^>]*>\s*([^<]*?)\s*</{tag}>", 1)


def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host", body_col: str = "body") -> DataFrame:
    """(host, body) -> one row per sitemap entry:
    (host, kind, loc, lastmod, changefreq, priority).

    ``kind`` is 'url' for urlset entries and 'sitemap' for sitemapindex
    entries (child sitemap pointers — feed these back into the fetch
    frontier). ``priority`` defaults to 0.5 per the protocol;
    ``lastmod`` parses W3C datetime date prefixes.
    """
    frags = sitemaps.select(
        host_col,
        F.explode(F.split(F.col(body_col), r"</(?:url|sitemap)>")).alias("chunk"),
    ).select(
        host_col,
        F.regexp_extract("chunk", r"<(url|sitemap)\b[^>]*>([\s\S]*)$", 1).alias("kind"),
        F.regexp_extract("chunk", r"<(?:url|sitemap)\b[^>]*>([\s\S]*)$", 1).alias("frag"),
    ).filter(F.col("kind") != "")
    loc = F.regexp_replace(_frag_field("loc"), "&amp;", "&")
    return frags.select(
        host_col,
        "kind",
        loc.alias("loc"),
        F.to_date(
            F.nullif(F.substring(_frag_field("lastmod"), 1, 10), F.lit(""))
        ).alias("lastmod"),
        F.nullif(_frag_field("changefreq"), F.lit("")).alias("changefreq"),
        F.coalesce(
            F.nullif(_frag_field("priority"), F.lit("")).cast("double"), F.lit(0.5)
        ).alias("priority"),
    ).filter(F.col("loc") != "")


def fresh_urls(entries: DataFrame, last_crawl: DataFrame, host_col: str = "host") -> DataFrame:
    """Recrawl selection: sitemap url entries whose lastmod is after the
    host's last crawl (or that are brand-new). ``last_crawl`` is
    (host, crawled_at:date); hosts never crawled take everything.
    One broadcast-friendly equi-join — the last_crawl side is one row
    per host."""
    lc = last_crawl.select(F.col(host_col).alias("__lh"), "crawled_at")
    return (
        entries.filter(F.col("kind") == "url")
        .join(lc, F.col(host_col) == F.col("__lh"), "left")
        .filter(
            F.col("crawled_at").isNull()
            | F.col("lastmod").isNull()
            | (F.col("lastmod") > F.col("crawled_at"))
        )
        .select(*entries.columns)
    )
