"""WARC source (sources/warc.py): ISO 28500 record framing, gzip
members, HTTP payload split, page extraction."""

import gzip

import pytest

from tokenkit_spark.sources import warc


def _fixture_records():
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b"<html><body>hello\r\n\r\nworld</body></html>"
    )
    return [
        {
            "WARC-Type": "warcinfo",
            "WARC-Record-ID": "<urn:uuid:0>",
            "Content-Type": "application/warc-fields",
            "payload": b"software: test\r\n",
        },
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:1>",
            "WARC-Target-URI": "https://example.com/a",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
            "payload": http,
        },
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:2>",
            "WARC-Target-URI": "https://example.com/404",
            "WARC-Date": "2024-01-01T00:00:01Z",
            "Content-Type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 404 Not Found\r\n\r\ngone",
        },
    ]


def test_roundtrip_framing():
    data = warc.write_warc(_fixture_records())
    recs = warc.split_warc_records(data)
    assert len(recs) == 3
    h = warc.parse_headers(recs[1][1])
    assert h["warc-type"] == "response"
    assert h["warc-target-uri"] == "https://example.com/a"
    # Content-Length authoritative: payload blank lines don't split records
    status, ctype, body = warc.split_http_payload(recs[1][2])
    assert status == 200
    assert ctype == "text/html; charset=utf-8"
    assert body == b"<html><body>hello\r\n\r\nworld</body></html>"


def test_gzip_members_roundtrip():
    data = warc.write_warc(_fixture_records(), compress=True)
    assert data[:2] == b"\x1f\x8b"
    plain = warc._gunzip_members(data)
    assert len(warc.split_warc_records(plain)) == 3


def test_bad_framing_raises():
    with pytest.raises(ValueError):
        warc.split_warc_records(b"NOT A WARC\r\n\r\n")


def test_read_warc_spark(spark, tmp_path):
    plain = tmp_path / "crawl-00000.warc"
    plain.write_bytes(warc.write_warc(_fixture_records()))
    gz = tmp_path / "crawl-00001.warc.gz"
    gz.write_bytes(warc.write_warc(_fixture_records(), compress=True))

    recs = warc.read_warc(spark, str(tmp_path)).cache()
    assert recs.count() == 6  # 3 records x 2 files
    by_type = {
        r["warc_type"]: r["cnt"]
        for r in recs.groupBy("warc_type").agg({"*": "count"})
        .withColumnRenamed("count(1)", "cnt").collect()
    }
    assert by_type == {"warcinfo": 2, "response": 4}

    pages = warc.warc_pages(recs).collect()
    # only the 200s survive (404 filtered), one per file
    assert len(pages) == 2
    assert {p.url for p in pages} == {"https://example.com/a"}
    assert all(bytes(p.body).startswith(b"<html>") for p in pages)
