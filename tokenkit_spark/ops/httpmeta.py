"""WHATWG-style character-encoding resolution over crawl HTTP metadata.

WHATWG Encoding Standard §"determine the character encoding" (the
sniffing ladder every browser and Common Crawl's WET extractor
implement, distilled to the layers a crawl pipeline actually stores):

    1. byte-order mark in the payload        (certain)
    2. ``charset=`` in the Content-Type HTTP header
    3. ``<meta charset>`` / http-equiv declaration in the HTML head
    4. fallback: utf-8

A crawl pipeline needs the RESOLVED encoding per page to decode
payloads, and the header-vs-meta disagreement rate per host as a data
-quality signal (mislabeled legacy hosts are where mojibake comes
from — see ``ops/webclean.py:fix_mojibake`` for the repair side).

Implementation is pure Catalyst: two ``regexp_extract`` probes + a
``startswith`` BOM check + one coalesce ladder, then a per-host hash
aggregate.  The BOM is represented as the U+FEFF code point on the
decoded-prefix column (the binary-layer BOM bytes collapse to it);
patterns are RE2-safe and shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADER_CHARSET_RX = r"charset=([A-Za-z0-9_-]+)"
META_CHARSET_RX = "<meta[^>]*charset=[\"']?([A-Za-z0-9_-]+)"


def resolve_charset(
    pages: DataFrame,
    header_col: str = "content_type",
    body_col: str = "body_prefix",
) -> DataFrame:
    """Adds ``bom_charset``, ``header_charset``, ``meta_charset`` and
    the WHATWG-precedence ``resolved`` column."""
    bom = F.when(
        F.col(body_col).startswith("﻿"), F.lit("utf-8")
    )
    hdr = F.lower(F.regexp_extract(F.col(header_col), HEADER_CHARSET_RX, 1))
    meta = F.lower(F.regexp_extract(F.col(body_col), META_CHARSET_RX, 1))
    return (
        pages.withColumn("bom_charset", bom)
        .withColumn("header_charset", F.nullif(hdr, F.lit("")))
        .withColumn("meta_charset", F.nullif(meta, F.lit("")))
        .withColumn(
            "resolved",
            F.coalesce(
                "bom_charset", "header_charset", "meta_charset",
                F.lit("utf-8"),
            ),
        )
    )


def charset_stats(
    pages: DataFrame,
    host_col: str = "host",
    header_col: str = "content_type",
    body_col: str = "body_prefix",
    round_digits: int = 4,
) -> DataFrame:
    """Per (host, resolved encoding): page count, BOM count, and the
    header/meta disagreement count + rate (both declared AND
    different) — the mislabeled-legacy-host signal."""
    r = resolve_charset(pages, header_col, body_col)
    mismatch = (
        F.col("header_charset").isNotNull()
        & F.col("meta_charset").isNotNull()
        & (F.col("header_charset") != F.col("meta_charset"))
    ).cast("int")
    return r.groupBy(F.col(host_col).alias("host"), "resolved").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col("bom_charset").isNotNull().cast("int"))
        .cast("long")
        .alias("n_bom"),
        F.sum(mismatch).cast("long").alias("n_mismatch"),
        F.round(F.sum(mismatch) / F.count(F.lit(1)), round_digits).alias(
            "mismatch_rate"
        ),
    )


HEURISTIC_FRACTION = 0.1  # RFC 9111 §4.2.2 suggested 10% of LM age


def cache_freshness_audit(
    pages: DataFrame,
    headers_col: str = "headers",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """HTTP cache freshness-lifetime audit (RFC 9111 / RFC 7234 §4.2)
    — how recrawlable a host's responses say they are.

    Freshness resolution order per the spec: a ``no-store`` (or
    ``no-cache``) directive wins (lifetime 0, not cacheable); else
    ``Cache-Control: max-age=N`` wins over ``Expires``; else
    ``Expires - Date``; else the HEURISTIC lifetime of §4.2.2 — a
    fraction (canonically 10%) of ``Date - Last-Modified``.  For a
    crawler this is the politeness-free recrawl signal: the share of
    explicit vs heuristic vs uncacheable responses and the lifetime
    distribution bound how much conditional revalidation can save
    (the measured twin lives in ``ops/recrawl.py``).

    Per host: (host, n_pages, n_no_store, n_explicit, n_heuristic,
    n_uncacheable, frac_cacheable, mean_fresh_s, max_fresh_s).
    Lifetimes in seconds.  Pure regexp + timestamp arithmetic —
    codegen projections, one hash aggregate.
    """
    h = F.col(headers_col)
    # IMF-fixdate with the redundant day-of-week dropped before parsing
    # (Spark's proleptic parser rejects EEE round-trips; the weekday
    # carries no information)
    fmt = "dd MMM yyyy HH:mm:ss 'GMT'"

    def hdr_ts(name):
        return F.to_timestamp(
            F.nullif(
                F.regexp_extract(h, name + r": \w+, ([^\n]+)", 1),
                F.lit(""),
            ),
            fmt,
        )

    date_ts = hdr_ts("Date")
    exp_ts = hdr_ts("Expires")
    lm_ts = hdr_ts("Last-Modified")
    max_age = F.nullif(
        F.regexp_extract(h, r"Cache-Control: [^\n]*max-age=(\d+)", 1),
        F.lit(""),
    ).cast("long")
    no_store = h.rlike(r"Cache-Control: [^\n]*(no-store|no-cache)")
    exp_life = F.unix_timestamp(exp_ts) - F.unix_timestamp(date_ts)
    heur_life = F.floor(
        (F.unix_timestamp(date_ts) - F.unix_timestamp(lm_ts))
        * HEURISTIC_FRACTION
    ).cast("long")
    fresh = (
        F.when(no_store, F.lit(0).cast("long"))
        .when(max_age.isNotNull(), max_age)
        .when(exp_ts.isNotNull() & date_ts.isNotNull(), exp_life)
        .when(lm_ts.isNotNull() & date_ts.isNotNull(), heur_life)
        .otherwise(F.lit(0).cast("long"))
    )
    kind = (
        F.when(no_store, F.lit("no_store"))
        .when(max_age.isNotNull(), F.lit("explicit"))
        .when(exp_ts.isNotNull() & date_ts.isNotNull(), F.lit("explicit"))
        .when(lm_ts.isNotNull() & date_ts.isNotNull(), F.lit("heuristic"))
        .otherwise(F.lit("uncacheable"))
    )
    per = pages.select(
        F.col(host_col).alias("host"),
        fresh.alias("fresh_s"),
        kind.alias("kind"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum((F.col("kind") == "no_store").cast("long")).alias(
            "n_no_store"
        ),
        F.sum((F.col("kind") == "explicit").cast("long")).alias(
            "n_explicit"
        ),
        F.sum((F.col("kind") == "heuristic").cast("long")).alias(
            "n_heuristic"
        ),
        F.sum((F.col("kind") == "uncacheable").cast("long")).alias(
            "n_uncacheable"
        ),
        F.round(
            F.sum((F.col("fresh_s") > 0).cast("long"))
            / F.count(F.lit(1)),
            round_digits,
        ).alias("frac_cacheable"),
        F.round(F.avg("fresh_s"), round_digits).alias("mean_fresh_s"),
        F.max("fresh_s").alias("max_fresh_s"),
    )


def status_mix_audit(
    pages: DataFrame,
    status_col: str = "status",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """HTTP status-class mix per host — the crawl-health dashboard
    row.

    The first triage cut of any crawl report: per host, the share of
    2xx (content), 3xx (redirect mass — pair with
    ``ops/outlinks.py``'s chains), 4xx (dead links the frontier
    should stop retrying) and 5xx (server distress — back off, per
    the politeness contract).  An elevated 3xx share flags canonical
    misconfiguration; elevated 5xx gates the adaptive crawl-delay.

    Per host: (host, n_requests, p2xx, p3xx, p4xx, p5xx,
    health_flag) with health_flag set when 5xx > 5% or 4xx > 20%.
    """
    cls = (F.col(status_col) / 100).cast("int")
    per = pages.select(
        F.col(host_col).alias("host"), cls.alias("c")
    )
    agg = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_requests"),
        *[
            F.round(
                F.sum((F.col("c") == k).cast("long"))
                / F.count(F.lit(1)),
                round_digits,
            ).alias(f"p{k}xx")
            for k in (2, 3, 4, 5)
        ],
    )
    return agg.withColumn(
        "health_flag",
        (F.col("p5xx") > 0.05) | (F.col("p4xx") > 0.2),
    )

HSTS_YEAR_S = 31536000


def security_headers_audit(
    pages: DataFrame,
    headers_col: str = "headers",
    host_col: str = "host",
) -> DataFrame:
    """Security-response-header adoption audit (OWASP Secure Headers
    project; RFC 6797 for HSTS).

    The five headers every hardening scanner checks:
    ``Strict-Transport-Security`` (with the preload-grade one-year
    ``max-age`` split out per hstspreload.org's submission bar),
    ``Content-Security-Policy``, ``X-Content-Type-Options: nosniff``,
    clickjacking protection (``X-Frame-Options`` or a CSP
    ``frame-ancestors`` directive), and ``Referrer-Policy``.  The
    per-host mean coverage score is the 0..1 "how hardened is this
    origin" number.

    Per host: (host, n_pages, n_hsts, n_hsts_year, n_csp, n_nosniff,
    n_frame, n_referrer) — integer counts only (the mean hardening
    score is (n_hsts + n_csp + n_nosniff + n_frame + n_referrer) /
    (5 * n_pages)), so the audit hashes identically on every engine.
    """
    h = F.col(headers_col)
    hsts = h.rlike(r"Strict-Transport-Security:").cast("long")
    hsts_age = F.nullif(
        F.regexp_extract(
            h, r"Strict-Transport-Security: [^\n]*max-age=(\d+)", 1
        ),
        F.lit(""),
    ).cast("long")
    hsts_year = (
        F.coalesce(hsts_age, F.lit(0)) >= HSTS_YEAR_S
    ).cast("long")
    csp = h.rlike(r"Content-Security-Policy:").cast("long")
    nosniff = h.rlike(
        r"X-Content-Type-Options: [^\n]*nosniff"
    ).cast("long")
    frame = (
        h.rlike(r"X-Frame-Options:")
        | h.rlike(r"Content-Security-Policy: [^\n]*frame-ancestors")
    ).cast("long")
    referrer = h.rlike(r"Referrer-Policy:").cast("long")
    per = pages.select(
        F.col(host_col).alias("host"),
        hsts.alias("hsts"),
        hsts_year.alias("hy"),
        csp.alias("csp"),
        nosniff.alias("ns"),
        frame.alias("fr"),
        referrer.alias("rp"),
    )
    # integer header-count sum over 5*n pages: one exact division,
    # no per-row float accumulation
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("hsts").alias("n_hsts"),
        F.sum("hy").alias("n_hsts_year"),
        F.sum("csp").alias("n_csp"),
        F.sum("ns").alias("n_nosniff"),
        F.sum("fr").alias("n_frame"),
        F.sum("rp").alias("n_referrer"),
    )


def content_encoding_audit(
    pages: DataFrame,
    headers_col: str = "headers",
    host_col: str = "host",
) -> DataFrame:
    """Content-Encoding adoption audit (RFC 9110 §8.4) — which hosts
    actually compress their responses.

    gzip vs brotli vs zstd vs none, plus the mean on-the-wire
    ``Content-Length`` split by compressed/uncompressed — at crawl
    scale the uncompressed-HTML share is a direct bandwidth-budget
    line item (HTTP Archive tracks exactly this number).

    Per host: (host, n_pages, n_gzip, n_br, n_zstd, n_identity,
    n_len_compressed, sum_len_compressed, n_len_identity,
    sum_len_identity) — exact integer counts and byte sums only (the
    compressed share is (n_pages - n_identity) / n_pages and the
    mean wire lengths are the sums over their counts), so the audit
    hashes identically on every engine.
    """
    h = F.col(headers_col)
    enc = F.lower(
        F.regexp_extract(h, r"Content-Encoding: ([^\n]+)", 1)
    )
    clen = F.nullif(
        F.regexp_extract(h, r"Content-Length: (\d+)", 1), F.lit("")
    ).cast("long")
    is_gzip = (enc == "gzip").cast("long")
    is_br = (enc == "br").cast("long")
    is_zstd = (enc == "zstd").cast("long")
    compressed = (is_gzip + is_br + is_zstd) > 0
    per = pages.select(
        F.col(host_col).alias("host"),
        is_gzip.alias("g"),
        is_br.alias("b"),
        is_zstd.alias("z"),
        compressed.cast("long").alias("c"),
        F.when(compressed, clen).alias("lc"),
        F.when(~compressed, clen).alias("li"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("g").alias("n_gzip"),
        F.sum("b").alias("n_br"),
        F.sum("z").alias("n_zstd"),
        (F.count(F.lit(1)) - F.sum("c")).alias("n_identity"),
        F.count("lc").alias("n_len_compressed"),
        F.coalesce(F.sum("lc"), F.lit(0)).alias("sum_len_compressed"),
        F.count("li").alias("n_len_identity"),
        F.coalesce(F.sum("li"), F.lit(0)).alias("sum_len_identity"),
    )


def conditional_get_audit(
    pages: DataFrame,
    headers_col: str = "headers",
    host_col: str = "host",
) -> DataFrame:
    """Conditional-GET readiness audit (RFC 9110 §13; RFC 7232) — how
    much of a recrawl could be 304s.

    A response carrying an ``ETag`` (strong or ``W/``-weak) or a
    ``Last-Modified`` date lets the next fetch be conditional
    (``If-None-Match`` / ``If-Modified-Since``), turning an unchanged
    page into a bodyless 304 — the single biggest bandwidth lever in
    polite recrawling next to the freshness lifetimes measured by
    ``cache_freshness_audit`` above.

    Per host: (host, n_pages, n_etag, n_weak_etag, n_last_modified,
    n_both, n_revalidatable) — integer counts only (the
    revalidatable share is n_revalidatable / n_pages), so the audit
    hashes identically on every engine.
    """
    h = F.col(headers_col)
    etag = h.rlike(r"ETag: ").cast("long")
    weak = h.rlike(r'ETag: W/"').cast("long")
    lm = h.rlike(r"Last-Modified: ").cast("long")
    both = ((etag == 1) & (lm == 1)).cast("long")
    reval = ((etag == 1) | (lm == 1)).cast("long")
    per = pages.select(
        F.col(host_col).alias("host"),
        etag.alias("e"),
        weak.alias("w"),
        lm.alias("l"),
        both.alias("b"),
        reval.alias("r"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("e").alias("n_etag"),
        F.sum("w").alias("n_weak_etag"),
        F.sum("l").alias("n_last_modified"),
        F.sum("b").alias("n_both"),
        F.sum("r").alias("n_revalidatable"),
    )
