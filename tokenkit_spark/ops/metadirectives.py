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


def sitemap_coverage_audit(
    crawled: DataFrame,
    sitemap: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    round_digits: int = 6,
) -> DataFrame:
    """Sitemap vs crawl coverage diff — the two-sided discovery gap.

    The Search-Console-style coverage report, computed from first
    principles: URLs LISTED in the sitemap but never crawled are the
    discovery debt (or stale sitemap entries); URLs CRAWLED but
    absent from the sitemap are the orphan-discovery surface (found
    only via links — fine for HTML, a smell for canonical content).
    Per host: both deltas plus the overlap, as counts and coverage
    rates — the number pairs a crawl-ops review reads next to the
    ``link_hygiene`` orphan counts.

    Per host: (host, n_sitemap, n_crawled, n_both,
    sitemap_only, crawled_only, sitemap_coverage, crawl_coverage).
    """
    s = sitemap.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("u")
    ).distinct()
    c = crawled.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("u")
    ).distinct()
    both = s.join(c, ["host", "u"]).groupBy("host").agg(
        F.count(F.lit(1)).alias("n_both")
    )
    ns = s.groupBy("host").agg(F.count(F.lit(1)).alias("n_sitemap"))
    nc = c.groupBy("host").agg(F.count(F.lit(1)).alias("n_crawled"))
    return (
        ns.join(nc, "host", "full")
        .join(both, "host", "left")
        .na.fill({"n_sitemap": 0, "n_crawled": 0, "n_both": 0})
        .select(
            "host",
            "n_sitemap",
            "n_crawled",
            "n_both",
            (F.col("n_sitemap") - F.col("n_both")).alias(
                "sitemap_only"
            ),
            (F.col("n_crawled") - F.col("n_both")).alias(
                "crawled_only"
            ),
            F.round(
                F.when(
                    F.col("n_sitemap") > 0,
                    F.col("n_both")
                    / F.col("n_sitemap").cast("double"),
                ),
                round_digits,
            ).alias("sitemap_coverage"),
            F.round(
                F.when(
                    F.col("n_crawled") > 0,
                    F.col("n_both")
                    / F.col("n_crawled").cast("double"),
                ),
                round_digits,
            ).alias("crawl_coverage"),
        )
    )


def canonical_loop_audit(
    pages: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical",
) -> DataFrame:
    """rel=canonical loop and chain hygiene — the canonicalization
    failure modes search engines silently ignore.

    Google's documented canonical handling (and every SEO crawler's
    check): a canonical CHAIN (A -> B where B itself points to C)
    dilutes the signal, and a canonical LOOP (A -> B -> A) makes it
    undefined — engines then pick their own canonical, which is
    exactly what the tag was meant to prevent.  The audit classifies
    every non-self-canonical edge: loop2 (mutual pair), chain (the
    target re-canonicalizes elsewhere), or clean (target is
    self-canonical or untagged).

    One row: (n_pages, n_self_or_none, n_edges, n_loop2, n_chain,
    n_clean).  The problematic share is (n_loop2 + n_chain) / n_edges;
    only the exact integer counts are emitted so the audit hashes
    identically on every engine (no float ratio columns).
    """
    p = pages.select(
        F.col(url_col).alias("u"), F.col(canonical_col).alias("c")
    )
    n_pages = p.count()
    edges = p.filter(
        F.col("c").isNotNull() & (F.col("c") != F.col("u"))
    )
    n_edges = edges.count()
    tgt = p.select(
        F.col("u").alias("c"), F.col("c").alias("tc")
    )
    j = edges.join(tgt, "c", "left")
    loop2 = j.filter(F.col("tc") == F.col("u")).count()
    chain = j.filter(
        F.col("tc").isNotNull()
        & (F.col("tc") != F.col("u"))
        & (F.col("tc") != F.col("c"))
    ).count()
    clean = n_edges - loop2 - chain
    spark = pages.sparkSession
    return spark.createDataFrame(
        [
            (
                n_pages,
                n_pages - n_edges,
                n_edges,
                loop2,
                chain,
                clean,
            )
        ],
        "n_pages long, n_self_or_none long, n_edges long, "
        "n_loop2 long, n_chain long, n_clean long",
    )


def meta_refresh_audit(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
) -> DataFrame:
    """Meta-refresh and JS-redirect audit — the redirects HTTP headers
    don't show.

    Search engines treat an instant (0-second) ``<meta
    http-equiv=refresh>`` as a permanent redirect and a delayed one
    as a soft redirect / doorway smell (Google's sneaky-redirect
    guidelines); ``location.href``/``location.replace`` assignments
    are the JS equivalent a header-only crawl misses entirely.  The
    audit counts each flavor per host from the raw HTML.

    Per host: (host, n_pages, n_meta_refresh, n_instant, n_delayed,
    n_js_redirect, n_any_redirect) — integer counts only, so the
    audit hashes identically on every engine; the any-redirect share
    is n_any_redirect / n_pages.
    """
    t = F.lower(F.col(html_col))
    has_refresh = (
        F.regexp_count(
            t, F.lit('http-equiv="refresh"')
        )
        > 0
    ).cast("long")
    # delay is the leading integer of the content attribute
    delay = F.regexp_extract(
        t, r'http-equiv="refresh"[^>]*content="(\d+)', 1
    )
    instant = (
        (has_refresh == 1) & (delay == "0")
    ).cast("long")
    delayed = (
        (has_refresh == 1) & (delay != "0") & (delay != "")
    ).cast("long")
    js = (
        (
            F.regexp_count(t, F.lit(r"location\.href\s*="))
            + F.regexp_count(t, F.lit(r"location\.replace\("))
        )
        > 0
    ).cast("long")
    any_redir = (
        (has_refresh == 1) | (js == 1)
    ).cast("long")
    return (
        pages.select(
            F.col(host_col).alias("host"),
            has_refresh.alias("mr"),
            instant.alias("inst"),
            delayed.alias("dly"),
            js.alias("js"),
            any_redir.alias("anyr"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("mr").alias("n_meta_refresh"),
            F.sum("inst").alias("n_instant"),
            F.sum("dly").alias("n_delayed"),
            F.sum("js").alias("n_js_redirect"),
            F.sum("anyr").alias("n_any_redirect"),
        )
    )


def feed_discovery_audit(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
) -> DataFrame:
    """Feed auto-discovery audit — which hosts still advertise
    RSS/Atom.

    The ``<link rel="alternate" type="application/rss+xml">``
    convention (RSS autodiscovery; RFC 4287 for Atom) is how
    aggregators and crawlers find a site's machine-readable change
    feed — for a recrawl scheduler a feed is a cheaper change signal
    than any sitemap.  Counts pages advertising each feed flavor.

    Per host: (host, n_pages, n_rss, n_atom, n_json_feed, n_any) —
    integer counts only (the feed share is n_any / n_pages), so the
    audit hashes identically on every engine.
    """
    t = F.lower(F.col(html_col))
    rss = (
        F.regexp_count(
            t, F.lit('type="application/rss\\+xml"')
        )
        > 0
    ).cast("long")
    atom = (
        F.regexp_count(
            t, F.lit('type="application/atom\\+xml"')
        )
        > 0
    ).cast("long")
    jf = (
        F.regexp_count(t, F.lit('type="application/feed\\+json"'))
        > 0
    ).cast("long")
    anyf = ((rss + atom + jf) > 0).cast("long")
    per = pages.select(
        F.col(host_col).alias("host"),
        rss.alias("r"),
        atom.alias("a"),
        jf.alias("j"),
        anyf.alias("x"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("r").alias("n_rss"),
        F.sum("a").alias("n_atom"),
        F.sum("j").alias("n_json_feed"),
        F.sum("x").alias("n_any"),
    )


def render_dependence_audit(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
) -> DataFrame:
    """Render-dependence audit — how much of a host needs a headless
    browser.

    A crawler's JS-rendering budget is orders of magnitude more
    expensive than HTML fetches (Google's own two-wave indexing
    exists because of it), so the scheduling input is syntactic:
    external vs inline script counts, ``<noscript>`` fallbacks
    (sites that know they break), and iframes (content that isn't in
    this document at all).

    Per host: (host, n_pages, n_script_ext, n_script_inline,
    n_noscript, n_iframe, n_scripts_total) — integer counts only
    (mean scripts per page is n_scripts_total / n_pages), so the
    audit hashes identically on every engine.
    """
    t = F.lower(F.col(html_col))
    ext = F.regexp_count(t, F.lit("<script [^>]*src="))
    all_s = F.regexp_count(t, F.lit("<script"))
    inline = all_s - ext
    nos = F.regexp_count(t, F.lit("<noscript"))
    ifr = F.regexp_count(t, F.lit("<iframe"))
    per = pages.select(
        F.col(host_col).alias("host"),
        ext.alias("e"),
        inline.alias("i"),
        all_s.alias("s"),
        nos.alias("n"),
        ifr.alias("f"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("e").alias("n_script_ext"),
        F.sum("i").alias("n_script_inline"),
        F.sum("n").alias("n_noscript"),
        F.sum("f").alias("n_iframe"),
        F.sum("s").alias("n_scripts_total"),
    )
