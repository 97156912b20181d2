"""CDX(J) crawl-index source + SURT URL canonicalization.

Common Crawl publishes its URL index as CDXJ lines:

    <urlkey> <timestamp> {"url": ..., "status": ..., "digest": ...}

where ``urlkey`` is the SURT (Sort-friendly URI Reordering Transform)
of the URL — host labels reversed and comma-joined, scheme/www dropped,
query params sorted — so one host's records sort contiguously:

    https://www.Example.com:8080/a/b?b=2&a=1  ->  com,example)/a/b?a=1&b=2

Everything here is pure Catalyst (regexp/split/sort_array/from_json):
parsing 10^11 index lines is a projection riding the text scan, and the
SURT key is exactly the clustering key you bucket/sort the index by at
rest — range pruning by domain becomes a prefix predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_JSON_SCHEMA = "url string, status int, digest string, length long"


def surt_key(url_col) -> Column:
    """SURT urlkey, Catalyst-only: lowercase; scheme + leading ``www.``
    dropped; default ports stripped; host labels reversed and
    comma-joined; fragment dropped; query params sorted byte-wise.
    Empty path canonicalizes to ``/``."""
    u = F.lower(url_col)
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")   # scheme
    u = F.regexp_replace(u, r"#.*$", "")                     # fragment
    hostport = F.regexp_extract(u, r"^([^/?]+)", 1)
    rest = F.substring(u, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def parse_cdx_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """CDXJ text lines -> (urlkey, timestamp, url, status, digest,
    length). The JSON block is everything from the first ``{``; the two
    space-separated fields before it are urlkey and timestamp. Pure
    Catalyst; malformed JSON yields NULL fields (from_json is
    permissive), framing-less lines are dropped."""
    v = F.col(value_col)
    parsed = lines.select(
        F.substring_index(v, " ", 1).alias("urlkey"),
        F.element_at(F.split(v, " ", 3), 2).alias("timestamp"),
        F.from_json(
            F.regexp_extract(v, r"(\{.*\})\s*$", 1), CDX_JSON_SCHEMA
        ).alias("j"),
    ).filter(F.col("urlkey") != "")
    return parsed.select(
        "urlkey", "timestamp", "j.url", "j.status", "j.digest", "j.length"
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ files -> parsed records. Text-source scan (splittable,
    line-parallel at any file size) + the Catalyst line parser."""
    return parse_cdx_lines(spark.read.text(path))


def cdx_lines(records: DataFrame) -> DataFrame:
    """(url, timestamp, status, digest, length) -> CDXJ text lines with
    a computed SURT urlkey — the sink/round-trip side."""
    j = F.to_json(F.struct("url", "status", "digest", "length"))
    return records.select(
        F.concat_ws(" ", surt_key(F.col("url")), F.col("timestamp"), j).alias("value")
    )
