"""Session-L batch 12: regex gram acceleration, selective pruning,
source overlap matrix, periodogram, length-bias audit."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ regex accel
def test_required_grams_extraction():
    from tokenkit_spark.index.regexgram import required_grams

    assert required_grams("sp.rk", 2) == ["sp", "rk"]
    assert required_grams("gr..p", 2) == ["gr"]
    assert required_grams("s..n", 2) == []
    assert required_grams("table", 2) == ["ta", "ab", "bl", "le"]


def test_regex_gram_candidates_and_matches(spark):
    from tokenkit_spark.index.regexgram import regex_gram_audit

    docs = spark.createDataFrame(
        [(0, "spark spork sprout stark join jorn")],
        "doc_id long, text string",
    )
    out = {r.pattern: r for r in regex_gram_audit(
        docs, [(0, "sp.rk"), (1, "jo.n"), (2, "x..z")], n=2
    ).collect()}
    r = out["sp.rk"]
    # candidates must contain sp AND rk: spark, spork
    assert r.n_candidates == 2 and r.n_matches == 2
    assert r.precision == 1.0
    assert out["jo.n"].n_matches == 2  # join, jorn
    # no literal runs >= 2 chars -> full scan of 6 terms
    assert out["x..z"].n_grams == 0 and out["x..z"].n_candidates == 6
    assert out["x..z"].n_matches == 0


# ------------------------------------------------------- selective pruning
def test_selective_pruning_tiers_and_exactness(spark):
    from tokenkit_spark.index.selective import selective_pruning_audit

    docs = spark.createDataFrame(
        [(i, f"common rare{i % 40}") for i in range(120)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "common"), (1, "rare7")], "query_id long, text string"
    )
    out = {r.query_id: r for r in selective_pruning_audit(
        docs, q, avictf_threshold=3.0, r=20, k=5
    ).collect()}
    # the rare term is high-AvICTF -> pruned tier; common -> exhaustive
    assert out[1].tier == "pruned"
    assert out[0].tier == "exhaustive"
    # exhaustive tier is exact by construction
    assert out[0].topk_overlap == 5
    # pruned tier scores far fewer docs than the full match set
    assert out[1].n_scored_docs <= 20


# ---------------------------------------------------------- source overlap
def test_source_overlap_between_sources(spark):
    from tokenkit_spark.ops.dedup import source_overlap_matrix

    shared = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (0, shared, "A"),
            (1, shared + " extra", "B"),   # cross-source near-dup
            (2, "totally different content here", "A"),
            (3, "another unrelated document text", "B"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.source_a, r.source_b): r
           for r in source_overlap_matrix(docs).collect()}
    ab = out[("A", "B")]
    assert ab.n_dup_pairs == 1
    # 2x2 cross combos -> 1/4 = 250000 ppm
    assert ab.dup_rate_ppm == pytest.approx(250000.0)


# ------------------------------------------------------------- periodogram
def test_periodogram_weekly_peak(spark):
    from tokenkit_spark.ops.trend import periodogram

    rows = []
    for day in range(1, 29):
        n = 20 if (day - 1) % 7 == 0 else 5
        for _ in range(n):
            rows.append((dt.datetime(2024, 1, day, 12, 0), 1, "a", 1.0))
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.period: r for r in periodogram(ev).collect()}
    assert out[7].is_peak
    assert out[7].power > out[3].power


# -------------------------------------------------------------- length bias
def test_length_bias_classic_vs_bm25(spark):
    from tokenkit_spark.index.lmsim import length_bias_audit

    # long docs repeat the query term heavily; short docs mention once
    docs = spark.createDataFrame(
        [(i, "term " * 50 + f"pad{i} " * 50) for i in range(5)]
        + [(i, f"term only{i}") for i in range(5, 25)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "term")], "query_id long, text string")
    out = {r.similarity: r for r in length_bias_audit(
        docs, q, k=10
    ).collect()}
    assert set(out) == {"bm25", "classic_tfidf", "lm_dirichlet"}
    for r in out.values():
        assert r.corpus_avgdl > 0 and r.bias_ratio > 0
    # raw sqrt(tf)/sqrt(dl) tfidf rewards the stuffed long docs more
    # than saturated BM25 does
    assert (
        out["classic_tfidf"].mean_topk_dl >= out["bm25"].mean_topk_dl
    )
