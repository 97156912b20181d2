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
    assert r.mean_score == pytest.approx((1.0 + 0.2 + 0.0) / 3, abs=1e-6)


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
    assert r.frac_compressed == pytest.approx(0.75)
    assert r.mean_len_compressed == pytest.approx(90.0)
    assert r.mean_len_identity == pytest.approx(600.0)


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
    assert r.n_revalidatable == 3
    assert r.frac_revalidatable == pytest.approx(0.75)
