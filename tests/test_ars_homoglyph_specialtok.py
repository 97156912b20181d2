"""C3 replica selection (index/ars.py), homoglyph skeleton detection
(ops/webclean.py), special-token contamination scan
(ops/contamination.py)."""

from pyspark.sql import functions as F

from tokenkit_spark.index.ars import replica_selection
from tokenkit_spark.ops.contamination import special_token_scan
from tokenkit_spark.ops.webclean import homoglyph_domains, skeleton


def _stats(spark, rows):
    return spark.createDataFrame(
        rows,
        "shard long, replica long, r_ewma double, service_time double,"
        " queue double, outstanding double",
    )


def test_c3_rank_prefers_idle_fast_replica(spark):
    # replica 0: fast and idle; replica 1: same speed but queueing
    rows = [
        (0, 0, 1.0, 0.1, 0.0, 0.0),
        (0, 1, 1.0, 0.1, 3.0, 1.0),
    ]
    out = {r.replica: r for r in replica_selection(_stats(spark, rows), 3).collect()}
    assert out[0].is_winner and not out[1].is_winner
    # rank0 = 1 - 0.1 + 1^3*0.1 = 1.0; rank1 = 1 - 0.1 + 7^3*0.1 = 35.2
    assert abs(out[0].rank_score - 1.0) < 1e-6
    assert abs(out[1].rank_score - 35.2) < 1e-6


def test_c3_cubic_queue_penalty_beats_latency_gap(spark):
    # replica 0 is slower on EWMA but empty; replica 1 faster but has
    # queue 2 with outstanding 1 -> q_hat = 1 + 3 + 2 = 6 -> 216x
    rows = [
        (0, 0, 2.0, 0.2, 0.0, 0.0),
        (0, 1, 1.0, 0.1, 2.0, 1.0),
    ]
    out = {r.replica: r for r in replica_selection(_stats(spark, rows), 3).collect()}
    assert out[0].is_winner


# ----------------------------------------------------------- homoglyph


def test_skeleton_folds_confusables(spark):
    df = spark.createDataFrame([("раypal.com",)], "h string")
    got = df.select(skeleton(F.col("h")).alias("s")).collect()[0].s
    assert got == "paypal.com"


def test_homoglyph_domains_finds_spoof_pairs(spark):
    hosts = spark.createDataFrame(
        [("apple.com",), ("аpple.com",), ("google.com",), ("bank.net",),
         ("bаnk.net",), ("bank.net",)],
        "host string",
    )
    out = {r.skeleton: r for r in homoglyph_domains(hosts).collect()}
    assert set(out) == {"apple.com", "bank.net"}
    a = out["apple.com"]
    assert a.n_hosts == 2 and a.n_spoofed == 1
    assert a.hosts.split(",")[0] == "apple.com"
    # pure-ASCII collision groups (none here) and singletons excluded
    assert "google.com" not in out


# ------------------------------------------------------- special tokens


def test_special_token_scan_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "plain text", "web"),
            (2, "ends with <|endoftext|>", "web"),
            (3, "[CLS] a [CLS] b", "forum"),
            (4, "nothing here", "forum"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source, r.token): r for r in special_token_scan(docs).collect()
    }
    assert out[("web", "<|endoftext|>")].n_docs == 1
    assert out[("forum", "[CLS]")].n_occurrences == 2
    # clean groups emit no rows
    assert all(k[1] in ("<|endoftext|>", "[CLS]") for k in out)


def test_special_token_scan_regex_metachars_literal(spark):
    # tokens contain | and [ ] — must be treated literally
    docs = spark.createDataFrame(
        [(1, "a or b", "s")], "doc_id long, text string, source string"
    )
    assert special_token_scan(docs).count() == 0
