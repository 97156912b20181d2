"""HTML document-structure audits — heading outlines, structured
data, titles.

The SEO/extraction-facing metadata layer between raw HTML and clean
text: heading hierarchy (the page's implicit outline), embedded
schema.org structured data, and title hygiene.  All three are pure
regexp projections over the markup — deliberately tag-level (the
DOM-free subset that survives a 100-TB pass without an HTML parser;
the full-fidelity path would swap the regexps for a parser UDF at
the same seam, as ``ops/cetr.py`` documents for content extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H_RX = "(?i)<h([1-6])[^>]*>"
_JSONLD_RX = r'(?i)<script[^>]*type="application/ld\+json"'
_OG_RX = r'(?i)<meta[^>]*property="og:'
_TW_RX = r'(?i)<meta[^>]*name="twitter:'
_TITLE_RX = r"(?i)<title[^>]*>([^<]*)</title>"


def heading_outline(
    pages: DataFrame,
    html_col: str = "html",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """Heading-hierarchy audit per host: heading counts by level,
    pages with no h1, pages with multiple h1s (the classic outline
    smells), and the mean heading depth.  One regexp_extract_all per
    page; two rollups."""
    h = F.col(html_col)
    levels = F.transform(
        F.regexp_extract_all(h, F.lit(_H_RX), F.lit(1)),
        lambda x: x.cast("int"),
    )
    per = pages.select(
        F.col(host_col).alias("host"),
        F.size(levels).alias("n_headings"),
        F.size(F.filter(levels, lambda l: l == 1)).alias("n_h1"),
        F.aggregate(
            levels, F.lit(0), lambda acc, x: acc + x
        ).alias("depth_sum"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("n_headings").alias("n_headings"),
        F.sum((F.col("n_h1") == 0).cast("long")).alias("pages_no_h1"),
        F.sum((F.col("n_h1") > 1).cast("long")).alias(
            "pages_multi_h1"
        ),
        F.round(
            F.sum("depth_sum")
            / F.greatest(F.sum("n_headings"), F.lit(1)).cast("double"),
            round_digits,
        ).alias("mean_level"),
    )


def structured_data_audit(
    pages: DataFrame,
    html_col: str = "html",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """Structured-data presence per host: JSON-LD blocks, Open Graph
    and Twitter-card meta tags — the machine-readable surface rich
    results and social previews consume.  Counts + coverage
    fractions; one row per host."""
    h = F.col(html_col)
    per = pages.select(
        F.col(host_col).alias("host"),
        F.regexp_count(h, F.lit(_JSONLD_RX)).alias("n_jsonld"),
        F.regexp_count(h, F.lit(_OG_RX)).alias("n_og"),
        F.regexp_count(h, F.lit(_TW_RX)).alias("n_tw"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("n_jsonld").alias("jsonld_blocks"),
        F.sum((F.col("n_jsonld") > 0).cast("long")).alias(
            "pages_jsonld"
        ),
        F.sum((F.col("n_og") > 0).cast("long")).alias("pages_og"),
        F.sum((F.col("n_tw") > 0).cast("long")).alias("pages_twitter"),
        F.round(
            F.sum(
                (
                    (F.col("n_jsonld") > 0)
                    | (F.col("n_og") > 0)
                    | (F.col("n_tw") > 0)
                ).cast("long")
            )
            / F.count(F.lit(1)),
            round_digits,
        ).alias("frac_any_structured"),
    )


def title_dedup_audit(
    pages: DataFrame,
    html_col: str = "html",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """Duplicate-title audit per host: distinct titles vs pages,
    empty/missing titles, and the largest duplicate-title family —
    the `<title>` hygiene signal dashboards surface (templated titles
    depress clickthrough and collapse SERP entries)."""
    t = F.trim(F.regexp_extract(F.col(html_col), _TITLE_RX, 1))
    per = pages.select(
        F.col(host_col).alias("host"),
        F.when(t != "", t).alias("title"),
    )
    fam = (
        per.filter(F.col("title").isNotNull())
        .groupBy("host", "title")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col("title").isNull().cast("long")).alias(
            "pages_untitled"
        ),
    )
    b = fam.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_distinct_titles"),
        F.max("c").alias("max_title_family"),
    )
    return (
        a.join(b, "host", "left")
        .na.fill({"n_distinct_titles": 0, "max_title_family": 0})
        .select(
            "host",
            "n_pages",
            "pages_untitled",
            "n_distinct_titles",
            "max_title_family",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct_titles")
                / (F.col("n_pages") - F.col("pages_untitled")).cast(
                    "double"
                ),
                round_digits,
            ).alias("dup_title_rate"),
        )
    )


def title_body_coverage(
    pages: DataFrame,
    host_col: str = "host",
    title_col: str = "title",
    body_col: str = "body",
) -> DataFrame:
    """Title-body term coverage — does the title describe the page?

    The on-page relevance check behind both SEO audits and
    clickbait/doorway detection: a title whose terms never recur in
    the body is either bait or boilerplate, and ranking models that
    weight title matches (BM25F's title field) are most misled by
    exactly those pages.  Coverage = fraction of distinct
    lowercased title words appearing as words in the body.

    Per host: (host, n_pages, n_with_title, sum_cov_ppm,
    n_zero_coverage, n_full_coverage).  Coverage is carried as exact
    integer parts-per-million (floor(hits * 1e6 / n_title_words) via
    integer division), summed as a bigint — no float accumulation, so
    the audit hashes identically on every engine; the mean coverage
    is sum_cov_ppm / n_with_title / 1e6.
    """
    tw = F.array_distinct(
        F.split(F.lower(F.trim(F.col(title_col))), r"\s+")
    )
    bw = F.split(F.lower(F.col(body_col)), r"\s+")
    hits = F.size(F.array_intersect(tw, bw))
    ntw = F.size(tw)
    per = pages.select(
        F.col(host_col).alias("host"),
        hits.cast("long").alias("hits"),
        ntw.cast("long").alias("ntw"),
    )
    # exact integer ppm: floor division of bigints, no doubles
    per = per.withColumn(
        "cov_ppm",
        F.when(
            F.col("ntw") > 0,
            F.expr("(hits * CAST(1000000 AS BIGINT)) DIV ntw"),
        ),
    ).withColumn(
        "z",
        F.when(F.col("ntw") > 0, (F.col("hits") == 0).cast("long")),
    ).withColumn(
        "fl",
        F.when(
            F.col("ntw") > 0,
            (F.col("hits") == F.col("ntw")).cast("long"),
        ),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.count("cov_ppm").alias("n_with_title"),
        F.coalesce(F.sum("cov_ppm"), F.lit(0)).alias("sum_cov_ppm"),
        F.coalesce(F.sum("z"), F.lit(0)).alias("n_zero_coverage"),
        F.coalesce(F.sum("fl"), F.lit(0)).alias("n_full_coverage"),
    )


def alt_text_audit(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
) -> DataFrame:
    """Image alt-text coverage — the accessibility metric that is
    also an image-search ranking input.

    WCAG 1.1.1 requires a text alternative per image; crawlers use
    the same attribute as the primary image-relevance signal, so
    missing alt text costs both audiences at once (the WebAIM
    Million survey tracks this exact per-page rate).  Counted
    syntactically: ``<img`` tags vs those carrying an ``alt=``
    attribute.

    Per host: (host, n_pages, n_img, n_img_alt, n_pages_incomplete)
    — integer counts only (the alt coverage is n_img_alt / n_img), so
    the audit hashes identically on every engine.
    """
    t = F.lower(F.col(html_col))
    n_img = F.regexp_count(t, F.lit("<img "))
    n_alt = F.regexp_count(t, F.lit("<img [^>]*alt="))
    per = pages.select(
        F.col(host_col).alias("host"),
        n_img.alias("ni"),
        n_alt.alias("na"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("ni").alias("n_img"),
        F.sum("na").alias("n_img_alt"),
        F.sum(
            (F.col("ni") > F.col("na")).cast("long")
        ).alias("n_pages_incomplete"),
    )


SCHEMA_TYPES = ("Article", "Product", "Organization", "FAQPage",
                "BreadcrumbList", "Recipe")


def schema_type_mix(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
) -> DataFrame:
    """schema.org ``@type`` mix per host — what a host claims to be.

    Rich-result eligibility is keyed on the JSON-LD ``@type``
    (Google's structured-data gallery enumerates them); at corpus
    scale the per-host type mix separates publishers (Article),
    shops (Product), and recipe/FAQ farms — the same signal the
    ``structured_data_audit`` presence counts summarize, resolved to
    the type level.  Counts pages declaring each pinned type.

    Per host: (host, n_pages, n_article, n_product, n_organization,
    n_faqpage, n_breadcrumblist, n_recipe, n_typed) — integer counts
    only (the typed share is n_typed / n_pages), so the audit hashes
    identically on every engine.
    """
    t = F.col(html_col)
    flags = []
    for i, st in enumerate(SCHEMA_TYPES):
        flags.append(
            (
                F.regexp_count(
                    t, F.lit(f'"@type":\\s*"{st}"')
                )
                > 0
            )
            .cast("long")
            .alias(f"t{i}")
        )
    per = pages.select(F.col(host_col).alias("host"), *flags)
    anyf = F.col("t0")
    for i in range(1, len(SCHEMA_TYPES)):
        anyf = anyf + F.col(f"t{i}")
    per = per.withColumn("a", (anyf > 0).cast("long"))
    aggs = [F.count(F.lit(1)).alias("n_pages")]
    for i, st in enumerate(SCHEMA_TYPES):
        aggs.append(F.sum(f"t{i}").alias(f"n_{st.lower()}"))
    aggs.append(F.sum("a").alias("n_typed"))
    return per.groupBy("host").agg(*aggs)


OG_REQUIRED = ("og:title", "og:type", "og:image", "og:url")


def og_completeness_audit(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
) -> DataFrame:
    """Open Graph completeness audit — the four required properties.

    The OG protocol (ogp.me) declares og:title, og:type, og:image,
    and og:url REQUIRED for a page to function as a share object;
    link previews degrade tag by tag.  Pages are bucketed complete /
    partial / absent, with per-tag counts — the sharing-readiness
    dashboard of a publisher host.

    Per host: (host, n_pages, n_title, n_type, n_image, n_url,
    n_complete, n_partial, n_absent) — integer counts only (the
    complete share is n_complete / n_pages), so the audit hashes
    identically on every engine.
    """
    t = F.lower(F.col(html_col))
    flags = []
    for i, prop in enumerate(OG_REQUIRED):
        flags.append(
            (
                F.regexp_count(
                    t, F.lit(f'property="{prop}"')
                )
                > 0
            )
            .cast("long")
            .alias(f"g{i}")
        )
    per = pages.select(F.col(host_col).alias("host"), *flags)
    tot = F.col("g0") + F.col("g1") + F.col("g2") + F.col("g3")
    per = per.withColumn("tot", tot)
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("g0").alias("n_title"),
        F.sum("g1").alias("n_type"),
        F.sum("g2").alias("n_image"),
        F.sum("g3").alias("n_url"),
        F.sum((F.col("tot") == 4).cast("long")).alias("n_complete"),
        F.sum(
            ((F.col("tot") > 0) & (F.col("tot") < 4)).cast("long")
        ).alias("n_partial"),
        F.sum((F.col("tot") == 0).cast("long")).alias("n_absent"),
    )
