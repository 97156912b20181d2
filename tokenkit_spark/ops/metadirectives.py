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
