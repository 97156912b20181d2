"""Session-L batch 29: security headers, content encoding,
conditional GET."""

import pytest
from pyspark.sql import functions as F


def test_security_headers_score(spark):
    from tokenkit_spark.ops.httpmeta import security_headers_audit

    pages = spark.createDataFrame(
        [
            ("h", "Strict-Transport-Security: max-age=63072000\n"
                  "Content-Security-Policy: default-src 'self'\n"
                  "X-Content-Type-Options: nosniff\n"
                  "X-Frame-Options: DENY\n"
                  "Referrer-Policy: no-referrer\n"),
            ("h", "Strict-Transport-Security: max-age=300\n"),
            ("h", "Content-Type: text/html\n"),
        ],
        "host string, headers string",
    )
    r = security_headers_audit(pages).collect()[0]
    assert r.n_hsts == 2 and r.n_hsts_year == 1
    assert r.n_csp == 1 and r.n_nosniff == 1
    assert r.n_frame == 1 and r.n_referrer == 1
    # mean hardening score = sum of flags / (5 * n_pages) = 6/15
    assert (r.n_hsts + r.n_csp + r.n_nosniff + r.n_frame
            + r.n_referrer) == 6 and r.n_pages == 3


def test_content_encoding_split(spark):
    from tokenkit_spark.ops.httpmeta import content_encoding_audit

    pages = spark.createDataFrame(
        [
            ("h", "Content-Encoding: gzip\nContent-Length: 100\n"),
            ("h", "Content-Encoding: br\nContent-Length: 80\n"),
            ("h", "Content-Length: 600\n"),
            ("h", "Content-Encoding: zstd\nContent-Length: 90\n"),
        ],
        "host string, headers string",
    )
    r = content_encoding_audit(pages).collect()[0]
    assert r.n_gzip == 1 and r.n_br == 1 and r.n_zstd == 1
    assert r.n_identity == 1
    assert r.n_len_compressed == 3
    assert r.sum_len_compressed == 100 + 80 + 90
    assert r.n_len_identity == 1
    assert r.sum_len_identity == 600


def test_conditional_get_flags(spark):
    from tokenkit_spark.ops.httpmeta import conditional_get_audit

    pages = spark.createDataFrame(
        [
            ("h", 'ETag: "abc123"\n'
                  "Last-Modified: Mon, 01 Jan 2024 00:00:00 GMT\n"),
            ("h", 'ETag: W/"weak1"\n'),
            ("h", "Last-Modified: Tue, 02 Jan 2024 00:00:00 GMT\n"),
            ("h", "Content-Type: text/html\n"),
        ],
        "host string, headers string",
    )
    r = conditional_get_audit(pages).collect()[0]
    assert r.n_etag == 2 and r.n_weak_etag == 1
    assert r.n_last_modified == 2 and r.n_both == 1
    assert r.n_revalidatable == 3 and r.n_pages == 4
