"""Session-K operators: BM25L, DFR DLH13, Stream-VByte audit,
skip-pointer audit, log-merge policy audit, MinDist proximity."""

import math

from pyspark.sql import functions as F


def _corpus(spark):
    return spark.createDataFrame(
        [(0, "a b a"), (1, "a c"), (2, "c c")],
        "doc_id long, text string",
    )


def _q(spark, text="a"):
    return spark.createDataFrame([(0, text)], "query_id long, text string")


# ------------------------------------------------------------------ BM25L
def test_bm25l_hand_value(spark):
    from tokenkit_spark.index.bm25f import bm25_l

    rows = bm25_l(_corpus(spark), _q(spark), k=10).collect()
    by_doc = {r.doc_id: r.score for r in rows}
    n, avgdl, df = 3, 7 / 3, 2
    idf = math.log((n + 1.0) / (df + 0.5))

    def score(tf, dl):
        c = tf / (1 - 0.75 + 0.75 * dl / avgdl)
        return idf * (2.2) * (c + 0.5) / (1.2 + c + 0.5)

    assert abs(by_doc[0] - round(score(2, 3), 4)) < 1e-6
    assert abs(by_doc[1] - round(score(1, 2), 4)) < 1e-6
    assert 2 not in by_doc  # no query term


def test_bm25l_long_doc_less_penalized_than_bm25(spark):
    """The BM25L selling point: a very long doc containing the term
    keeps a larger share of its score than under plain BM25."""
    from tokenkit_spark.index.bm25f import bm25_l, bm25_plus

    docs = spark.createDataFrame(
        [(0, "a " + "z " * 200), (1, "a b")], "doc_id long, text string"
    )
    l_rows = {r.doc_id: r.score for r in bm25_l(docs, _q(spark)).collect()}
    # bm25_plus with delta=0 == plain BM25
    p_rows = {
        r.doc_id: r.score
        for r in bm25_plus(docs, _q(spark), delta=0.0).collect()
    }
    assert l_rows[0] / l_rows[1] > p_rows[0] / p_rows[1]


# ------------------------------------------------------------------ DLH13
def test_dlh13_hand_value(spark):
    from tokenkit_spark.index.lmsim import dlh13

    rows = dlh13(_corpus(spark), _q(spark), k=10).collect()
    by_doc = {r.doc_id: r.score for r in rows}
    n_docs, total = 3, 7
    avgdl = total / n_docs
    cf_a = 3  # 'a' occurs 2 + 1 times

    def score(tf, dl):
        f = tf / dl
        s = (
            tf * math.log2((tf * avgdl / dl) * (n_docs / cf_a))
            + 0.5 * math.log2(2 * math.pi * tf * max(1 - f, 1e-10))
        ) / (tf + 0.5)
        return max(s, 0.0)

    assert abs(by_doc[0] - round(score(2, 3), 4)) < 2e-4
    assert abs(by_doc[1] - round(score(1, 2), 4)) < 2e-4


def test_dlh13_full_doc_term_clamped(spark):
    """tf == dl drives the Bernoulli correction to -inf; the clamp
    keeps the score finite and >= 0."""
    from tokenkit_spark.index.lmsim import dlh13

    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "a b")], "doc_id long, text string"
    )
    rows = dlh13(docs, _q(spark), k=10).collect()
    assert all(math.isfinite(r.score) and r.score >= 0 for r in rows)


# ------------------------------------------------------- Stream-VByte audit
def test_svb_audit_hand_bytes(spark):
    from tokenkit_spark.index.svb import svb_audit

    postings = spark.createDataFrame(
        [("x", 0), ("x", 300), ("x", 65836)], "term string, doc_id long"
    )
    r = svb_audit(postings, k=5).collect()[0]
    # gaps 0, 300, 65536 -> data 1+2+3, ctrl ceil(3/4)=1
    assert r.svb_data_bytes == 6
    assert r.svb_ctrl_bytes == 1
    assert r.svb_bytes == 7
    # varint: 1 + 2 + 3
    assert r.varint_bytes == 6
    assert abs(r.ratio - round(7 / 6, 4)) < 1e-9


def test_svb_dense_list_pays_control_overhead(spark):
    """All gaps < 128: data bytes tie varint exactly, the 2-bit
    control stream is pure overhead -> ratio > 1."""
    from tokenkit_spark.index.svb import svb_audit

    postings = spark.createDataFrame(
        [("t", i) for i in range(0, 100)], "term string, doc_id long"
    )
    r = svb_audit(postings, k=5).collect()[0]
    assert r.svb_data_bytes == r.varint_bytes == 100
    assert r.svb_ctrl_bytes == 25
    assert r.ratio > 1.0


# ------------------------------------------------------------- skip audit
def test_skip_audit_hand_cost(spark):
    from tokenkit_spark.index.skips import skip_audit

    # 'rare' in 2 docs, 'common' in 20
    docs = spark.createDataFrame(
        [(i, "common" + (" rare" if i < 2 else "")) for i in range(20)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "rare common")], "query_id long, text string"
    )
    r = skip_audit(docs, q).collect()[0]
    assert r.n_terms == 2 and r.df_min == 2
    assert r.cost_full == 22.0
    # driver (rare, df=2) decoded fully: 2; common: L=ceil(sqrt(20))=5,
    # est = min(20, 20/5 + 2*5/2) = 9
    assert abs(r.cost_skip - (2 + 9)) < 1e-9
    assert abs(r.saving_frac - round(1 - 11 / 22, 4)) < 1e-9


def test_skip_audit_degenerate_skips_never_worse(spark):
    """When every term is the driver-sized list the min() clamp keeps
    cost_skip <= cost_full."""
    from tokenkit_spark.index.skips import skip_audit

    docs = spark.createDataFrame(
        [(i, "a b") for i in range(10)], "doc_id long, text string"
    )
    q = spark.createDataFrame([(0, "a b")], "query_id long, text string")
    r = skip_audit(docs, q).collect()[0]
    assert r.cost_skip <= r.cost_full + 1e-9


# -------------------------------------------------------- log-merge audit
def test_logmerge_hand_costs(spark):
    from tokenkit_spark.index.logmerge import log_merge_audit

    # batch j gets doc_id j-1 (mod 3): tok(1)=len(d0)+len(d3), etc.
    docs = spark.createDataFrame(
        [(0, "w w"), (1, "w"), (2, "w w w"), (3, "w"), (4, "w w"), (5, "w")],
        "doc_id long, text string",
    )
    r = log_merge_audit(docs, n_batches=3, merge_factor=3).collect()[0]
    tok = {1: 3, 2: 3, 3: 4}  # d0+d3, d1+d4, d2+d5
    total = sum(tok.values())
    cost_imm = tok[1] + (tok[1] + tok[2]) + total
    cost_log = total  # single level-1 merge at i=3
    assert r.total_tokens == total
    assert r.cost_immediate == cost_imm
    assert r.cost_log == cost_log
    assert abs(r.amp_log - round(cost_log / total, 4)) < 1e-9
    assert r.segments_log == 1  # 3 = 10_3, digit sum 1


def test_logmerge_log_cheaper_than_immediate(spark, sf_dir):
    from tokenkit_spark.index.logmerge import log_merge_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    r = log_merge_audit(docs, n_batches=30, merge_factor=3).collect()[0]
    assert r.cost_log < r.cost_immediate
    assert r.segments_log == 2


# ------------------------------------------------------- MinDist proximity
def test_mindist_breaks_bm25_tie_by_adjacency(spark):
    from tokenkit_spark.index.proxfeat import mindist_rerank

    docs = spark.createDataFrame(
        [(0, "x q a a"), (1, "x b q a"), (2, "x a a a")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "x q")], "query_id long, text string")
    rows = sorted(
        mindist_rerank(docs, q, k=10).collect(), key=lambda r: r.rank
    )
    assert [r.doc_id for r in rows] == [0, 1, 2]
    md = {r.doc_id: r.mindist for r in rows}
    assert md == {0: 1, 1: 2, 2: 1000}


def test_mindist_single_term_query_keeps_bm25_order(spark):
    """With one query term there are no pairs: every candidate gets the
    cap sentinel and the constant ln(alpha) bonus — BM25 order holds."""
    from tokenkit_spark.index.bm25f import bm25_plus
    from tokenkit_spark.index.proxfeat import mindist_rerank

    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "x y z"), (2, "y z w")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "x")], "query_id long, text string")
    got = [
        r.doc_id
        for r in sorted(
            mindist_rerank(docs, q, k=10).collect(), key=lambda r: r.rank
        )
    ]
    want = [
        r.doc_id
        for r in sorted(
            bm25_plus(docs, q, delta=0.0, k=10).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert got == want
