"""Page-level indexing directives — robots meta tags and rel=canonical
link extraction.

robots.txt (ops/robots.py) governs FETCHING; what a crawler may *index*
is decided per page by ``<meta name="robots" content="noindex,
nofollow">`` (the REP meta-tag extension, RFC 9309 §2.3's companion
convention documented by every engine) and duplicate consolidation by
``<link rel="canonical" href="...">`` (Google/Bing/Yahoo's 2009 joint
canonical-link convention; the cross-host dedup signal a crawl pipeline
must honor before near-dup hashing even runs — an explicit canonical
beats any similarity score).

Extraction is pure regexp over the raw HTML head (attribute order
tolerated for the name/content pair; href quoted either way) — no DOM,
whole-stage codegen, one projection.  The rollup is one host-keyed
aggregate.  10^10 pages shard on anything; nothing leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_ROBOTS = (
    r"""<meta\s+name=["']robots["']\s+content=["']([^"']*)["']"""
)
_CANONICAL = (
    r"""<link\s+rel=["']canonical["']\s+href=["']([^"']*)["']"""
)


def page_directives(
    pages: DataFrame,
    html_col: str = "html",
) -> DataFrame:
    """Adds ``robots_content``, ``noindex``, ``nofollow``,
    ``canonical`` (NULL when absent) to every page row."""
    content = F.regexp_extract(F.col(html_col), _META_ROBOTS, 1)
    canon = F.nullif(
        F.regexp_extract(F.col(html_col), _CANONICAL, 1), F.lit("")
    )
    return pages.withColumns(
        {
            "robots_content": F.nullif(content, F.lit("")),
            "noindex": content.rlike(r"(^|[,\s])noindex([,\s]|$)"),
            "nofollow": content.rlike(r"(^|[,\s])nofollow([,\s]|$)"),
            "canonical": canon,
        }
    )


def directive_rollup(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
    round_digits: int = 6,
) -> DataFrame:
    """One row per host: (host, n_pages, n_noindex, n_nofollow,
    n_canonical, n_cross_host_canonical, frac_indexable) — the crawl
    planner's view of how much of a host is actually indexable and how
    much consolidates elsewhere."""
    d = page_directives(pages, html_col)
    cross = F.col("canonical").isNotNull() & ~F.col("canonical").contains(
        F.col(host_col)
    )
    return d.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col("noindex").cast("int")).cast("long").alias("n_noindex"),
        F.sum(F.col("nofollow").cast("int"))
        .cast("long")
        .alias("n_nofollow"),
        F.sum(F.col("canonical").isNotNull().cast("int"))
        .cast("long")
        .alias("n_canonical"),
        F.sum(cross.cast("int")).cast("long").alias(
            "n_cross_host_canonical"
        ),
        F.round(
            F.avg((~F.col("noindex")).cast("int")), round_digits
        ).alias("frac_indexable"),
    )


HREFLANG_TAG_RX = '<link[^>]*rel="alternate"[^>]*>'
HREFLANG_LANG_RX = 'hreflang="([A-Za-z-]+)"'
HREFLANG_HREF_RX = 'href="([^"]+)"'


def hreflang_links(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """One row per <link rel="alternate" hreflang> annotation:
    (url, lang, target).  Pure regexp_extract_all + array transforms —
    codegen, no UDF."""
    tags = F.regexp_extract_all(F.col(html_col), F.lit(HREFLANG_TAG_RX), 0)
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, HREFLANG_LANG_RX, 1).alias("lang"),
            F.regexp_extract(t, HREFLANG_HREF_RX, 1).alias("target"),
        ),
    )
    return (
        pages.select(F.col(url_col).alias("url"), F.explode(pairs).alias("p"))
        .select("url", F.col("p.lang").alias("lang"),
                F.col("p.target").alias("target"))
        .filter((F.col("lang") != "") & (F.col("target") != ""))
    )


def hreflang_reciprocity(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    round_digits: int = 4,
) -> DataFrame:
    """hreflang reciprocity audit (Google Search Central's hreflang
    contract, the operational reading of RFC 8288 alternate links):
    an annotation url -> target only VALIDATES when the target page
    annotates back to url — one-way links are ignored by search
    engines, the single most common international-SEO defect.

    Per source page: (url, n_links, n_reciprocal, all_reciprocal).
    Relational shape: the link relation self-joined on the reversed
    (url, target) key — one equi-join riding the link key, no windows.
    """
    links = hreflang_links(pages, url_col, html_col)
    rev = links.select(
        F.col("target").alias("url"), F.col("url").alias("target")
    ).distinct()
    flagged = links.join(
        rev.withColumn("recip", F.lit(1)), ["url", "target"], "left"
    )
    return flagged.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.sum(F.coalesce("recip", F.lit(0))).cast("long").alias(
            "n_reciprocal"
        ),
        (F.sum(F.coalesce("recip", F.lit(0))) == F.count(F.lit(1))).alias(
            "all_reciprocal"
        ),
    )


XROBOTS_RX = "(?i)x-robots-tag:\\s*([a-z, ]+)"


def robots_conflicts(
    pages: DataFrame,
    host_col: str = "host",
    header_col: str = "headers",
    html_col: str = "html",
    round_digits: int = 4,
) -> DataFrame:
    """X-Robots-Tag header vs meta-robots conflict audit (Google
    Search Central's robots-meta documentation: the header and the
    meta tag carry the same directive vocabulary, the MOST RESTRICTIVE
    wins, and disagreement is an operational smell — typically a CDN
    layer fighting the application).

    Per host: pages with both channels present, noindex conflicts
    (exactly one channel says noindex), and the effective noindex
    count under most-restrictive-wins.  Pure regexp + one hash
    aggregate; composes with ``page_directives`` (same meta parse)."""
    meta_content = F.regexp_extract(F.col(html_col), _META_ROBOTS, 1)
    hdr_content = F.lower(
        F.regexp_extract(F.col(header_col), XROBOTS_RX, 1)
    )
    meta_noindex = F.lower(meta_content).contains("noindex")
    hdr_noindex = hdr_content.contains("noindex")
    both = (meta_content != "") & (hdr_content != "")
    conflict = both & (meta_noindex != hdr_noindex)
    effective = meta_noindex | hdr_noindex
    return pages.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(both.cast("int")).cast("long").alias("n_both_channels"),
        F.sum(conflict.cast("int")).cast("long").alias("n_conflicts"),
        F.sum(effective.cast("int")).cast("long").alias(
            "n_effective_noindex"
        ),
        F.round(F.avg(conflict.cast("int")), round_digits).alias(
            "conflict_rate"
        ),
    )
