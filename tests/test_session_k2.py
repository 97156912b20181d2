"""Session-K batch 3: charset sniffing, MP4 box walk, hedged requests,
truncation loss, modularity, keystroke savings."""

from pyspark.sql import functions as F


# --------------------------------------------------------- charset sniffing
def test_charset_precedence_ladder(spark):
    from tokenkit_spark.ops.httpmeta import resolve_charset

    pages = spark.createDataFrame(
        [
            # BOM beats a contradicting header and meta
            ("h", "text/html; charset=latin-1",
             "﻿<meta charset='koi8-r'>"),
            # header beats meta
            ("h", "text/html; charset=UTF-8", "<meta charset='shift_jis'>"),
            # meta only
            ("h", "text/html", "<meta charset=windows-1252>"),
            # nothing declared -> default
            ("h", "text/html", "<html><p>"),
        ],
        "host string, content_type string, body_prefix string",
    )
    got = [r.resolved for r in resolve_charset(pages).collect()]
    assert got == ["utf-8", "utf-8", "windows-1252", "utf-8"]


def test_charset_mismatch_counted(spark):
    from tokenkit_spark.ops.httpmeta import charset_stats

    pages = spark.createDataFrame(
        [
            ("a", "text/html; charset=UTF-8", "<meta charset='utf-8'>"),
            ("a", "text/html; charset=UTF-8", "<meta charset='latin-1'>"),
        ],
        "host string, content_type string, body_prefix string",
    )
    r = charset_stats(pages).collect()
    total_mismatch = sum(x.n_mismatch for x in r)
    assert total_mismatch == 1  # same-value declarations don't count


# ------------------------------------------------------------- MP4 box walk
def test_mp4_roundtrip_and_largesize(spark):
    from tokenkit_spark.ops.mp4 import make_mp4, parse_mp4_boxes

    p0 = make_mp4(b"isom", 3, b"x" * 10)
    p1 = make_mp4(b"mp42", 0, b"y" * 5, largesize_mdat=True)
    media = spark.createDataFrame(
        [(0, bytearray(p0)), (1, bytearray(p1))],
        "doc_id long, payload binary",
    )
    rows = parse_mp4_boxes(media).collect()
    by = {(r.doc_id, r.box_idx): r for r in rows}
    assert by[(0, 0)].box_type == "ftyp" and by[(0, 0)].box_size == 16
    assert by[(0, 1)].box_type == "free" and by[(0, 1)].box_size == 11
    assert by[(0, 2)].box_type == "mdat" and by[(0, 2)].box_size == 18
    assert by[(0, 2)].offset == 27
    # largesize: 16-byte header + 5 payload
    assert by[(1, 2)].box_size == 21
    assert all(r.err is None for r in rows)


def test_mp4_size_zero_extends_to_eof(spark):
    import struct

    from tokenkit_spark.ops.mp4 import parse_mp4_boxes

    payload = (
        struct.pack(">I", 16) + b"ftypisom\x00\x00\x00\x01"
        + struct.pack(">I", 0) + b"mdat" + b"z" * 30
    )
    media = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {r.box_idx: r for r in parse_mp4_boxes(media).collect()}
    assert rows[1].box_type == "mdat" and rows[1].box_size == 38


def test_mp4_corrupt_payload_yields_err_row(spark):
    from tokenkit_spark.ops.mp4 import parse_mp4_boxes

    media = spark.createDataFrame(
        [(7, bytearray(b"\x00\x00\x00\x40mdatshort"))],
        "doc_id long, payload binary",
    )
    rows = parse_mp4_boxes(media).collect()
    assert len(rows) == 1
    assert rows[0].err is not None and "overruns" in rows[0].err
    assert rows[0].box_type is None


# ----------------------------------------------------------- hedged requests
def test_hedging_improves_tail_not_median_much(spark):
    from tokenkit_spark.index.hedging import hedging_audit

    rows = hedging_audit(spark, n_requests=500, n_shards=4).collect()
    for r in rows:
        assert r.p99_hedged <= r.p99_primary  # the Dean-Barroso win
        assert r.p99_speedup >= 1.0
        assert 0.0 < r.hedge_rate <= 1.0
        assert r.p50_hedged <= r.p50_primary


# ---------------------------------------------------------- truncation loss
def test_truncation_loss_hand_values(spark):
    from tokenkit_spark.ops.packing import truncation_loss

    docs = spark.createDataFrame(
        [(0, "s1", "w " * 10), (1, "s1", "w " * 300)],
        "doc_id long, source string, text string",
    )
    rows = {(r.source, r.context_len): r
            for r in truncation_loss(docs, (128,)).collect()}
    r = rows[("s1", 128)]
    assert r.n_docs == 2 and r.docs_truncated == 1
    assert r.tokens_total == 310 and r.tokens_lost == 172
    assert abs(r.loss_frac - round(172 / 310, 4)) < 1e-9


# --------------------------------------------------------------- modularity
def test_modularity_two_cliques_is_half(spark):
    from tokenkit_spark.ops.communities import modularity_q

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "node long, label long",
    )
    rows = modularity_q(edges, labels).collect()
    assert abs(sum(r.q_contrib for r in rows) - 0.5) < 1e-9
    for r in rows:
        assert r.n_nodes == 3 and r.internal_edges == 3
        assert r.degree_sum == 6


def test_modularity_random_partition_near_zero(spark):
    from tokenkit_spark.ops.communities import modularity_q

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "src long, dst long",
    )
    # everything in one community: Q = 1 - 1 = 0 exactly
    labels = spark.createDataFrame(
        [(n, 0) for n in range(1, 7)], "node long, label long"
    )
    rows = modularity_q(edges, labels).collect()
    assert abs(sum(r.q_contrib for r in rows)) < 1e-9


# -------------------------------------------------------- keystroke savings
def test_mks_popularity_ranking(spark):
    from tokenkit_spark.ops.queryflow import keystroke_savings

    log = []
    for q, n in (("aa", 10), ("ab", 5), ("ac", 3), ("ad", 1)):
        log += [(q,)] * n
    qlog = spark.createDataFrame(log, "query string")
    rows = {r.query: r for r in keystroke_savings(qlog, top_n=3).collect()}
    # 'aa' is rank-1 for prefix 'a' -> one keystroke suffices
    assert rows["aa"].min_prefix == 1
    assert rows["ab"].min_prefix == 1  # rank 2 at 'a'
    assert rows["ac"].min_prefix == 1  # rank 3 at 'a'
    # 'ad' is rank 4 at 'a'; only its full string qualifies
    assert rows["ad"].min_prefix == 2
    assert abs(rows["aa"].saved_frac - 0.5) < 1e-9
    assert rows["ad"].saved_frac == 0.0
