"""DUST — Different URLs with Similar Text (Bar-Yossef, Keidar &
Schonfeld, "Do Not Crawl in the DUST", WWW 2007): mine URL rewrite
rules from observed (url, content-fingerprint) pairs so the crawler
canonicalizes duplicate URLs BEFORE fetching them.

This implements the parameter-irrelevance rule family (the dominant
DUST class on parameterized sites — session ids, tracking params):
for each query-parameter NAME k, group URLs by the URL with k removed
(the rule's antecedent); a group with >= 2 distinct values of k is
evidence supports the rule "drop k" if every URL in the group carries the
same content fingerprint, refute it otherwise.  Reported per
parameter:

  * ``n_groups``     — groups with >= 2 distinct k-values (evidence),
  * ``n_uniform``    — groups whose fingerprints all agree,
  * ``precision``    — n_uniform / n_groups (the paper's rule-support
                       validation step), and
  * ``n_urls_covered`` — URLs the rule would canonicalize away.

A frontier applies rules with precision >= a threshold (the paper
uses large-deviation bounds; the audit emits the raw counts so policy
stays with the caller — cf. ops/robots.py's same division of labor).

Scale shape: parameter extraction is one regexp explode per URL
(bounded by param count), grouping is a hash aggregate keyed by the
stripped URL — 10^12 URLs shuffle once on (param, residual) and once
on (param).  No UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dust_param_rules(
    pages: DataFrame,
    url_col: str = "url",
    fingerprint_col: str = "fingerprint",
    round_digits: int = 6,
) -> DataFrame:
    """(param, n_groups, n_uniform, precision, n_urls_covered) — one
    row per query-parameter name with >= 1 evidence group; see module
    doc."""
    base = pages.select(
        F.col(url_col).alias("url"), F.col(fingerprint_col).alias("fp")
    )
    params = base.select(
        "url",
        "fp",
        F.explode(
            F.expr(
                "regexp_extract_all(url, '[?&]([^=&#]+)=([^&#]*)', 1)"
            )
        ).alias("param"),
    )
    # residual = the url with THIS param=value pair removed (other
    # params kept in place).  Separator ambiguity after removal
    # ('?a=1&b=2' minus a leaves '&b=2'-style forms) is canonicalized
    # by mapping '&' -> '?' in the GROUPING KEY — a valid URL carries
    # one '?', so the translation is a deterministic canonical form,
    # not a rewrite of the URL itself.  Param names are treated as
    # literal [A-Za-z0-9_-] tokens (the extraction regex guarantees
    # no regex metacharacters reach the pattern).
    strip = F.regexp_replace(
        F.col("url"),
        F.concat(F.lit("[?&]"), F.col("param"), F.lit("=[^&#]*")),
        F.lit(""),
    )
    residual = F.translate(strip, "&", "?")
    grouped = (
        params.withColumn("residual", residual)
        .groupBy("param", "residual")
        .agg(
            F.countDistinct("url").alias("n_distinct_urls"),
            F.countDistinct("fp").alias("n_fp"),
        )
        .filter(F.col("n_distinct_urls") >= 2)
    )
    return (
        grouped.groupBy("param")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n_fp") == 1).cast("long")).alias("n_uniform"),
            F.sum(
                F.when(F.col("n_fp") == 1, F.col("n_distinct_urls") - 1)
                .otherwise(0)
            ).alias("n_urls_covered"),
        )
        .select(
            "param",
            "n_groups",
            "n_uniform",
            F.round(
                F.col("n_uniform") / F.col("n_groups"), round_digits
            ).alias("precision"),
            "n_urls_covered",
        )
        .orderBy("param")
    )


TRACKING_PARAM_RX = r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|ref|igshid)="


def tracking_param_audit(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """Tracking-query-parameter stripping audit — the deterministic
    cousin of the mined DUST rules (``dust_param_rules``).

    Click identifiers and campaign tags (utm_*, gclid, fbclid, ...)
    create unbounded families of URLs naming the SAME resource — the
    canonical "different URLs with similar text" source Bar-Yossef et
    al. (WWW 2007) mine rules for, except these are known a priori
    (they are what the uBlock/ClearURLs lists and Chrome's URL
    sanitizer strip).  For a crawl frontier the payoff is measured as
    dedup gain: distinct URLs before vs after dropping the tracking
    parameters (parameter ORDER preserved — this audit strips, it
    does not canonicalize; ``ops/domains.py`` owns full
    canonicalization).

    Per host: (host, n_urls, n_with_tracking, n_distinct_raw,
    n_distinct_stripped, dup_gain) with dup_gain = 1 -
    distinct_stripped/distinct_raw.  Pure split/filter/join string
    algebra — codegen, no UDFs, one hash aggregate.
    """
    u = F.col(url_col)
    base = F.substring_index(u, "?", 1)
    qs = F.when(
        u.contains("?"), F.substring_index(u, "?", -1)
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RX),
    )
    had_tracking = F.exists(
        F.split(qs, "&"), lambda p: p.rlike(TRACKING_PARAM_RX)
    )
    stripped = F.when(
        F.size(kept) > 0,
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)
    per = pages.select(
        F.col(host_col).alias("host"),
        u.alias("raw"),
        stripped.alias("stripped"),
        had_tracking.cast("long").alias("tr"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("tr").alias("n_with_tracking"),
        F.countDistinct("raw").alias("n_distinct_raw"),
        F.countDistinct("stripped").alias("n_distinct_stripped"),
        F.round(
            F.lit(1.0)
            - F.countDistinct("stripped")
            / F.countDistinct("raw").cast("double"),
            round_digits,
        ).alias("dup_gain"),
    )


def facet_explosion_audit(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    min_urls: int = 10,
    explosive_ratio: float = 0.9,
    round_digits: int = 6,
) -> DataFrame:
    """Query-parameter cardinality audit — which facets explode the
    URL space.

    The complement of the known-tracking-param strip list
    (``tracking_param_audit``): here nothing is known a priori, and
    the tell is CARDINALITY.  A navigation facet (``color=red``)
    takes a handful of values across many URLs; a session id or
    cache-buster takes a fresh value per URL (ratio ~1) and turns a
    finite site into an infinite crawl space — the parameter-trap
    case of Bar-Yossef's DUST.  Google's legacy "URL parameters"
    tool asked webmasters for exactly this classification; the audit
    derives it from counts.

    Per (host, param): (host, param, n_urls, n_values,
    value_ratio, explosive).
    """
    qs = F.regexp_extract(F.col(url_col), r"\?(.*)$", 1)
    kv = F.explode(F.split(qs, "&")).alias("kv")
    pairs = (
        urls.select(F.col(host_col).alias("host"), kv)
        .filter(F.col("kv") != "")
        .select(
            "host",
            F.split_part(F.col("kv"), F.lit("="), F.lit(1)).alias(
                "param"
            ),
            F.split_part(F.col("kv"), F.lit("="), F.lit(2)).alias(
                "val"
            ),
        )
    )
    g = pairs.groupBy("host", "param").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("val").alias("n_values"),
    )
    ratio = F.col("n_values") / F.col("n_urls").cast("double")
    return g.select(
        "host",
        "param",
        "n_urls",
        "n_values",
        F.round(ratio, round_digits).alias("value_ratio"),
        (
            (ratio > explosive_ratio) & (F.col("n_urls") >= min_urls)
        ).alias("explosive"),
    )


def case_collision_audit(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Case-collision audit — paths that merge on a case-insensitive
    server.

    URLs are case-sensitive per RFC 3986, but IIS/Windows origins
    serve ``/About`` and ``/about`` identically — instant duplicate
    content, and the mixed-case DUST class the normalization-rule
    miners special-case.  A host where many distinct paths collapse
    under lowercasing either needs case-folding in the canonicalizer
    or is generating links inconsistently.

    Per host: (host, n_paths, n_folded, n_collision_groups,
    max_group) — integer counts only (the redundant share is
    (n_paths - n_folded) / n_paths), so the audit hashes identically
    on every engine.
    """
    p = urls.select(
        F.col(host_col).alias("host"), F.col(path_col).alias("pp")
    ).distinct()
    g = p.groupBy(
        "host", F.lower(F.col("pp")).alias("lp")
    ).agg(F.count(F.lit(1)).alias("c"))
    return g.groupBy("host").agg(
        F.sum("c").alias("n_paths"),
        F.count(F.lit(1)).alias("n_folded"),
        F.sum((F.col("c") >= 2).cast("long")).alias(
            "n_collision_groups"
        ),
        F.max("c").alias("max_group"),
    )
