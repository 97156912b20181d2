"""Domain-level crawl analytics: registered-domain extraction, per-domain
aggregates, and blocklist filtering.

Crawl pipelines cut most policy decisions (quality priors, spam lists,
dedup scopes, robots exclusions) at the REGISTERED domain — the label
directly below the public suffix (``news.bbc.co.uk`` -> ``bbc.co.uk``,
``www.example.com`` -> ``example.com``).  The full public-suffix list is
~9k rules; this module ships the high-traffic multi-label suffixes and
treats any other suffix as single-label — the honest subset (the rule
TABLE is data, the algorithm is identical, and the constant is easy to
extend).

All expressions are pure Catalyst (regexp + array ops inside
whole-stage codegen): no UDF in the hot path, so extraction costs one
projection over the scan at any corpus size.  ``blocklist_filter`` is a
left_anti join on the registered domain; the blocklist side is small by
nature (10^4-10^6 rows), so AQE broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# high-traffic multi-label public suffixes (extend from the PSL as needed)
MULTI_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "re.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "web.za",
    "com.tr", "org.tr", "gov.tr",
    "co.nz", "org.nz", "govt.nz",
    "com.sg", "org.sg", "gov.sg",
]


def host_of(url_col) -> "F.Column":
    """Lowercased host of a URL (userinfo and port stripped, IPv6
    brackets removed); empty string when the input has no
    ``scheme://`` authority.

    Userinfo MUST be stripped here: ``https://x@blocked.com/`` would
    otherwise extract ``x@blocked.com`` and walk straight past a
    blocklist on ``blocked.com``."""
    c = url_col if not isinstance(url_col, str) else F.col(url_col)
    host = F.lower(
        F.regexp_extract(
            c,
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/:?#@\[]+)",
            1,
        )
    )
    host = F.regexp_replace(host, r":\d+$", "")
    return F.regexp_replace(host, r"^\[|\]$", "")


def registered_domain(url_col) -> "F.Column":
    """Registered domain (eTLD+1) of a URL via the built-in suffix table;
    hosts with fewer labels than suffix+1 fall back to the host itself."""
    host = host_of(url_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.when(n >= 2, F.concat_ws(".", F.element_at(labels, -2), last1))
    is_multi = last2.isin(MULTI_LABEL_SUFFIXES)
    return (
        F.when(host == "", F.lit(""))
        .when(is_multi & (n >= 3), F.concat_ws(".", F.element_at(labels, -3), last2))
        .when(is_multi, host)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def domain_stats(
    pages: DataFrame,
    url_col: str = "url",
    size_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain crawl aggregates: page count, distinct URL
    count, and (optionally) mean ``size_col`` rounded to 4 digits.

    Hash aggregate with map-side partials; the exact countDistinct adds
    one expand — swap for approx_count_distinct at 10^12 rows if the
    exactness isn't needed."""
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct(url_col).alias("n_urls"),
    ]
    if size_col is not None:
        aggs.append(F.round(F.avg(size_col), 4).alias("avg_size"))
    return pages.groupBy(registered_domain(url_col).alias("domain")).agg(*aggs)


def blocklist_filter(
    pages: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop pages whose registered domain appears in ``blocked``
    (one ``domain`` column). left_anti on the domain — the spam/abuse
    list cut every crawl applies before anything expensive runs."""
    keyed = pages.withColumn("__domain", registered_domain(url_col))
    out = keyed.join(
        blocked.select(F.col(domain_col).alias("__domain")).distinct(),
        "__domain",
        "left_anti",
    )
    return out.drop("__domain")


EXT_CLASSES = (
    ("page", ("html", "htm", "php", "asp", "aspx", "")),
    ("doc", ("pdf", "doc", "docx", "ppt", "xls")),
    ("image", ("jpg", "jpeg", "png", "gif", "webp", "svg")),
    ("asset", ("js", "css", "woff", "woff2", "ico")),
    ("data", ("xml", "json", "rss", "csv")),
)


def url_extension_mix(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """URL file-extension mix per host — what a host's URL space is
    made of before fetching a byte.

    The frontier-shaping heuristic every crawler applies: path
    extension predicts content class (page / document / image /
    asset / data feed), so the per-host mix decides how much of the
    discovered URL space is even worth an HTML-pipeline fetch.
    Extensionless paths count as pages (the clean-URL convention).

    Per host: (host, n_urls, n_page, n_doc, n_image, n_asset,
    n_data, n_other) — integer counts only (the page share is
    n_page / n_urls), so the audit hashes identically on every
    engine.
    """
    ext = F.lower(
        F.regexp_extract(F.col(path_col), r"\.([A-Za-z0-9]{1,5})$", 1)
    )
    cls = None
    for name, exts in EXT_CLASSES:
        cond = ext.isin(*[e for e in exts if e]) | (
            F.lit("" in exts) & (ext == "")
        )
        cls = (
            F.when(cond, F.lit(name))
            if cls is None
            else cls.when(cond, F.lit(name))
        )
    cls = cls.otherwise(F.lit("other"))
    per = urls.select(
        F.col(host_col).alias("host"), cls.alias("cls")
    )
    aggs = [F.count(F.lit(1)).alias("n_urls")]
    for name, _ in EXT_CLASSES:
        aggs.append(
            F.sum((F.col("cls") == name).cast("long")).alias(
                f"n_{name}"
            )
        )
    aggs.append(
        F.sum((F.col("cls") == "other").cast("long")).alias("n_other")
    )
    return per.groupBy("host").agg(*aggs)


def subdomain_profile(
    urls: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Subdomain sprawl profile per registered domain — the
    wildcard-subdomain spam signal.

    Subdomain farms (thousands of ``*.example.com`` hosts, each thin)
    are a classic web-spam and crawl-budget pathology; conversely,
    legitimate sites concentrate on apex + www.  Groups hosts by
    their registered domain (last two labels — the public-suffix
    approximation used by ``registered_domain`` above) and profiles
    the spread.

    Per domain: (domain, n_hosts, n_urls, n_www_urls, n_apex_urls,
    max_host_urls) — integer counts only (shares divide by n_urls),
    so the audit hashes identically on every engine.
    """
    host = F.col(host_col)
    parts = F.split(host, r"\.")
    np_ = F.size(parts)
    domain = F.when(
        np_ >= 2,
        F.concat_ws(
            ".", F.get(parts, np_ - 2), F.get(parts, np_ - 1)
        ),
    ).otherwise(host)
    per_host = urls.groupBy(
        domain.alias("domain"), host.alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_host.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("n").alias("n_urls"),
        F.sum(
            F.when(F.col("h").startswith("www."), F.col("n"))
            .otherwise(F.lit(0))
        ).alias("n_www_urls"),
        F.sum(
            F.when(F.col("h") == F.col("domain"), F.col("n"))
            .otherwise(F.lit(0))
        ).alias("n_apex_urls"),
        F.max("n").alias("max_host_urls"),
    )
