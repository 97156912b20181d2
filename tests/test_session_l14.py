"""Session-L batch 14: NB learning curve, IDF variants, Condorcet,
stopword ablation, storage tiering, streaming watermark dedup."""

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- nb curve
def test_nb_learning_curve_improves_with_data(spark):
    from tokenkit_spark.ops.nbayes import nb_learning_curve

    # two clearly separable classes
    rows = []
    for i in range(200):
        if i % 2 == 0:
            rows.append((i, "alpha beta gamma " + f"x{i % 7}", "A"))
        else:
            rows.append((i, "delta epsilon zeta " + f"y{i % 7}", "B"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = sorted(
        nb_learning_curve(docs).collect(), key=lambda r: r.train_frac
    )
    assert [r.train_frac for r in out] == [0.25, 0.5, 1.0]
    # nested training sets grow
    assert out[0].n_train < out[1].n_train < out[2].n_train
    # fully separable -> full-data model is perfect
    assert out[2].accuracy == 1.0
    assert all(r.n_test == out[0].n_test for r in out)


# ------------------------------------------------------------ idf variants
def test_idf_variants_baseline_identity(spark):
    from tokenkit_spark.index.lmsim import idf_variants_audit

    # 'alpha' in most-but-not-all docs (df == N terms are excluded by
    # the probabilistic-idf guard on every variant)
    docs = spark.createDataFrame(
        [(i, ("alpha " if i % 5 else "omega ") + f"beta w{i % 13}")
         for i in range(60)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "alpha w3")], "query_id long, text string"
    )
    out = {r.variant: r for r in idf_variants_audit(docs, q).collect()}
    # the baseline compared with itself is exact
    assert out["smoothed"].topk_overlap == 10
    assert out["smoothed"].top1_match == 1
    assert set(out) == {"smoothed", "plain", "probabilistic"}


# --------------------------------------------------------------- condorcet
def test_condorcet_unanimous_winner(spark):
    from tokenkit_spark.index.rankeval import condorcet_audit

    rows = []
    for ranker in ("r1", "r2", "r3"):
        for rank, doc in enumerate([100, 200, 300], start=1):
            rows.append((ranker, 0, doc, rank))
    runs = spark.createDataFrame(
        rows, "ranker string, query_id long, doc_id long, rank int"
    )
    r = condorcet_audit(runs, k=3).collect()[0]
    assert r.condorcet_winner == 100
    assert r.borda_winner == 100
    assert r.winners_agree


def test_condorcet_paradox_no_winner(spark):
    from tokenkit_spark.index.rankeval import condorcet_audit

    # the classic cycle: a>b>c, b>c>a, c>a>b
    orders = {"r1": [1, 2, 3], "r2": [2, 3, 1], "r3": [3, 1, 2]}
    rows = []
    for ranker, docs_ in orders.items():
        for rank, doc in enumerate(docs_, start=1):
            rows.append((ranker, 0, doc, rank))
    runs = spark.createDataFrame(
        rows, "ranker string, query_id long, doc_id long, rank int"
    )
    r = condorcet_audit(runs, k=3).collect()[0]
    assert r.condorcet_winner is None
    assert r.winners_agree is None  # NULL = no winner to agree with


# -------------------------------------------------------- stopword ablation
def test_stopword_ablation_counts(spark):
    from tokenkit_spark.index.layout import stopword_ablation_audit

    docs = spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "the dog and a log")],
        "doc_id long, text string",
    )
    out = {r.variant: r for r in stopword_ablation_audit(
        docs, ["the", "and", "a"]
    ).collect()}
    f, n = out["full"], out["no_stopwords"]
    assert f.frac_of_full_bytes == 1.0
    # stopword postings: the(2 docs) + and(2) + a(1) = 5 of 11
    assert f.n_postings - n.n_postings == 5
    assert n.frac_of_full_postings < 1.0


# --------------------------------------------------------- storage tiering
def test_storage_tiering_shares(spark):
    from tokenkit_spark.ops.frontier import storage_tiering_audit

    # one mega-hot object + a long cold tail
    rows = [(0, 1000.0, 50.0)] + [
        (i, 1.0, 100.0) for i in range(1, 101)
    ]
    d = spark.createDataFrame(rows, "doc_id long, freq double, bytes double")
    out = {r.tier: r for r in storage_tiering_audit(d).collect()}
    # the hot tier captures >= 80% of access with almost no bytes
    assert out["hot"].access_share >= 0.8
    assert out["hot"].bytes_share < 0.1
    assert out["cold"].n_docs > 0
    total_docs = sum(r.n_docs for r in out.values())
    assert total_docs == 101


# ------------------------------------------------- streaming watermark dedup
def test_dedup_within_watermark_bounded_state(spark):
    from tokenkit_spark.streaming.stats import dedup_within_watermark

    indir = tempfile.mkdtemp(prefix="tk_wmdedup_in_")
    outdir = tempfile.mkdtemp(prefix="tk_wmdedup_out_")
    ckpt = tempfile.mkdtemp(prefix="tk_wmdedup_ck_")
    schema = "key string, ts timestamp"

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(indir, name)
        )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # batch 1: duplicate inside the watermark window
    write_batch("b1", [("a", base), ("a", base), ("b", base)])
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(indir + "/*")
    )
    deduped = dedup_within_watermark(stream, ["key"], delay="10 minutes")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # advance the watermark far past 'a' + delay so its state is evicted
    write_batch("b2", [("c", base + dt.timedelta(hours=2))])
    q2 = (
        deduped.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    # duplicate of 'a' beyond the watermark window: state gone -> re-emit
    write_batch("b3", [("a", base + dt.timedelta(hours=5))])
    q3 = (
        deduped.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(120)
    got = spark.read.parquet(outdir).collect()
    keys = sorted(r.key for r in got)
    # within-watermark duplicate suppressed; expired-state dup re-emitted
    assert keys == ["a", "a", "b", "c"]
