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
