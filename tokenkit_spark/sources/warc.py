"""WARC (Web ARChive, ISO 28500) source — the container format Common
Crawl and every serious web crawl ships in.

A WARC file is a concatenation of records, each:

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...          (named fields, case-insensitive)
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n                                 (record separator)

``response`` records wrap an HTTP response (status line + HTTP headers +
body); the page bytes are the part after the first blank line of the
HTTP block.

Spark-first shape: files load via the built-in ``binaryFile`` source
(one row per file, content as bytes — splittable ACROSS files, which is
how crawls parallelize: Common Crawl ships ~100k x ~1 GB segments, so
file-granular parallelism saturates any cluster without in-file
splitting); record splitting + header parsing run in ``mapInPandas``
over Arrow batches. Gzip members (.warc.gz is per-record gzipped) are
handled with ``zlib`` per record — pure stdlib, no native deps.

This parser implements the subset of ISO 28500 the pipeline needs:
record framing, named headers, HTTP payload split. It is deliberately
strict about framing (Content-Length is authoritative) and lenient
about header whitespace/case, matching how real crawl data behaves.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "file string, record_offset long, warc_type string, warc_record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, http_status int, http_content_type string, "
    "payload binary"
)


def split_warc_records(data: bytes) -> list[tuple[int, bytes, bytes]]:
    """Split raw WARC bytes into (offset, header_block, payload) tuples.
    Content-Length is authoritative for the payload span (payloads may
    contain blank lines — never split on those)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(f"bad WARC framing at offset {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        header_block = data[pos:hdr_end]
        clen = 0
        for line in header_block.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                clen = int(v.strip())
        body_start = hdr_end + 4
        out.append((pos, header_block, data[body_start : body_start + clen]))
        pos = body_start + clen
    return out


def parse_headers(header_block: bytes) -> dict[str, str]:
    """Named WARC fields, keys lower-cased; the WARC/x.y line is skipped."""
    fields: dict[str, str] = {}
    for line in header_block.split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            fields[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
    return fields


def split_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response block; a
    payload without an HTTP status line passes through unsplit."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4 :]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        k, s, v = line.partition(b":")
        if s and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
    return status, ctype, body


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout: one
    member per record) into one byte stream."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(data[pos:]))
        out.write(d.flush())
        consumed = len(data[pos:]) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out.getvalue()


def _records_kernel(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batch_iter:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            data = bytes(content)
            if path.endswith(".gz") or data[:2] == b"\x1f\x8b":
                data = _gunzip_members(data)
            for offset, header_block, payload in split_warc_records(data):
                h = parse_headers(header_block)
                status, http_ctype, body = split_http_payload(payload)
                rows.append(
                    {
                        "file": path,
                        "record_offset": offset,
                        "warc_type": h.get("warc-type"),
                        "warc_record_id": h.get("warc-record-id"),
                        "target_uri": h.get("warc-target-uri"),
                        "warc_date": h.get("warc-date"),
                        "content_type": h.get("content-type"),
                        "content_length": int(h.get("content-length", 0)),
                        "http_status": status,
                        "http_content_type": http_ctype,
                        "payload": body,
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "file", "record_offset", "warc_type", "warc_record_id",
                "target_uri", "warc_date", "content_type", "content_length",
                "http_status", "http_content_type", "payload",
            ],
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files -> one row per record. ``binaryFile`` scan (file-level
    parallelism — the Common Crawl layout: ~1 GB per file, 10^5 files)
    + Arrow-batched record splitting. Filter on ``warc_type =
    'response'`` and ``http_status = 200`` for page payloads."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(_records_kernel, WARC_SCHEMA)


def warc_pages(records: DataFrame) -> DataFrame:
    """response records -> (url, fetched_at, content_type, body) — the
    page table the cleaning/index pipeline starts from."""
    return (
        records.filter(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            F.col("http_content_type").alias("content_type"),
            F.col("payload").alias("body"),
        )
    )


def write_warc(records: list[dict], compress: bool = False) -> bytes:
    """Serialize records (dicts with warc headers + ``payload`` bytes)
    back to WARC framing — the test fixture generator and the round-trip
    sink. One gzip member per record when ``compress`` (the .warc.gz
    layout)."""
    out = io.BytesIO()
    for rec in records:
        payload = rec["payload"]
        hdrs = [b"WARC/1.0"]
        for k, v in rec.items():
            if k == "payload":
                continue
            hdrs.append(f"{k}: {v}".encode())
        hdrs.append(f"Content-Length: {len(payload)}".encode())
        block = b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if compress:
            gz = zlib.compressobj(wbits=31)
            block = gz.compress(block) + gz.flush()
        out.write(block)
    return out.getvalue()
