"""RSS 2.0 / Atom feed parsing — the other structured crawl-discovery
source next to sitemaps (sources/sitemaps.py).

News/blog crawling discovers fresh URLs through feeds: RSS 2.0
(<channel> of <item><title/><link/><pubDate/><guid/></item>, RSS
Advisory Board spec) and Atom (RFC 4287: <entry> with <title/>,
<link href="..."/>, <updated/>, <id/>).  Same scale argument as the
sitemap parser: each item/entry is independent, so the parse is an
``explode(split(body, '</item|entry>'))`` + per-fragment
``regexp_extract`` projection — pure whole-stage-codegen Catalyst, no
DOM, alignment-safe when optional fields are missing, and it streams.

Format quirks handled: Atom links live in an ATTRIBUTE
(``<link href="..."/>`` — optionally rel="alternate"), RSS links in
element TEXT; RFC 822 pubDate ("Mon, 01 Jan 2024 10:30:00 GMT") vs
ISO-8601 Atom <updated>; &amp; entity decode in links; itemless
fragments (channel header) drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RFC822_MONTHS = {
    "Jan": 1, "Feb": 2, "Mar": 3, "Apr": 4, "May": 5, "Jun": 6,
    "Jul": 7, "Aug": 8, "Sep": 9, "Oct": 10, "Nov": 11, "Dec": 12,
}


def _field(tag: str):
    return F.regexp_extract("frag", rf"<{tag}[^>]*>\s*([\s\S]*?)\s*</{tag}>", 1)


def _rfc822_ts():
    """'Mon, 01 Jan 2024 10:30:00 GMT' -> timestamp (UTC naive)."""
    d = F.regexp_extract(
        "frag",
        r"<pubDate[^>]*>\s*\w{3},\s+(\d{1,2})\s+(\w{3})\s+(\d{4})"
        r"\s+(\d{2}:\d{2}:\d{2})",
        0,
    )
    day = F.regexp_extract(d, r",\s+(\d{1,2})\s", 1)
    mon = F.regexp_extract(d, r"\s(\w{3})\s+\d{4}", 1)
    yr = F.regexp_extract(d, r"\s(\d{4})\s", 1)
    tm = F.regexp_extract(d, r"(\d{2}:\d{2}:\d{2})", 1)
    mon_num = mon
    for name, num in _RFC822_MONTHS.items():
        mon_num = F.when(mon == name, F.lit(f"{num:02d}")).otherwise(mon_num)
    return F.to_timestamp(
        F.when(
            (yr != "") & (tm != ""),
            F.concat(
                yr, F.lit("-"), mon_num, F.lit("-"),
                F.lpad(day, 2, "0"), F.lit(" "), tm,
            ),
        )
    )


def parse_feeds(
    feeds: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> one row per feed item:
    (host, kind, title, link, guid, published) with kind in
    {'rss', 'atom'}."""
    frags = feeds.select(
        host_col,
        F.explode(
            F.split(F.col(body_col), r"</(?:item|entry)>")
        ).alias("chunk"),
    ).select(
        host_col,
        F.regexp_extract(
            "chunk", r"<(item|entry)\b[^>]*>([\s\S]*)$", 1
        ).alias("tag"),
        F.regexp_extract(
            "chunk", r"<(?:item|entry)\b[^>]*>([\s\S]*)$", 1
        ).alias("frag"),
    ).filter(F.col("tag") != "")
    kind = F.when(F.col("tag") == "item", "rss").otherwise("atom")
    rss_link = _field("link")
    atom_link = F.regexp_extract(
        "frag", r"""<link\b[^>]*\bhref=["']([^"']*)["']""", 1
    )
    link = F.regexp_replace(
        F.when(F.col("tag") == "item", rss_link).otherwise(atom_link),
        "&amp;",
        "&",
    )
    guid = F.when(F.col("tag") == "item", _field("guid")).otherwise(
        _field("id")
    )
    published = F.when(F.col("tag") == "item", _rfc822_ts()).otherwise(
        F.to_timestamp(
            F.nullif(
                F.regexp_replace(
                    F.substring(_field("updated"), 1, 19), "T", " "
                ),
                F.lit(""),
            )
        )
    )
    return (
        frags.select(
            host_col,
            kind.alias("kind"),
            F.nullif(_field("title"), F.lit("")).alias("title"),
            link.alias("link"),
            F.nullif(guid, F.lit("")).alias("guid"),
            published.alias("published"),
        )
        .filter(F.col("link") != "")
    )


def fresh_items(
    entries: DataFrame, since, host_col: str = "host"
) -> DataFrame:
    """Feed-driven recrawl: items published after ``since`` (or with no
    parseable date — fetch to be safe). Pure filter, no shuffle."""
    return entries.filter(
        F.col("published").isNull() | (F.col("published") > F.lit(since))
    )
