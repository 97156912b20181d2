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


# ------------------------------------------------------ weekday seasonality
def test_weekday_seasonality_iso_mapping(spark):
    from tokenkit_spark.ops.events import weekday_seasonality

    ev = spark.createDataFrame(
        [  # 2024-01-01 is a Monday
            (0, "view", "2024-01-01 10:00:00"),
            (1, "view", "2024-01-07 10:00:00"),  # Sunday
            (2, "view", "2024-01-08 23:00:00"),  # Monday
            (3, "view", "2024-01-04 00:00:00"),  # Thursday
        ],
        "event_id long, event_type string, ts_s string",
    ).select("event_id", "event_type", F.to_timestamp("ts_s").alias("ts"))
    rows = {r.weekday_iso: r for r in
            weekday_seasonality(ev).collect()}
    assert set(rows) == {1, 4, 7}
    assert rows[1].n_events == 2
    assert abs(rows[1].share - 0.5) < 1e-9
    assert abs(rows[1].seasonality_idx - 3.5) < 1e-9


# ------------------------------------------------------------- l-diversity
def test_l_diversity_flags_homogeneous_group(spark):
    from tokenkit_spark.ops.searchlog import l_diversity_audit

    rows = [
        # 'safe' query: 3 users, 2 domains -> released, l_ok
        (1, "safe", "a.com"), (2, "safe", "b.com"), (3, "safe", "a.com"),
        # 'homog' query: 3 users, 1 domain -> released, NOT l_ok
        (1, "homog", "x.com"), (2, "homog", "x.com"), (4, "homog", "x.com"),
        # 'rare' query: 2 users -> suppressed upstream, absent
        (1, "rare", "y.com"), (2, "rare", "z.com"),
    ]
    qlog = spark.createDataFrame(
        rows, "user_id long, query string, domain string"
    )
    got = {r.query: r for r in l_diversity_audit(qlog, l=2, k=3).collect()}
    assert set(got) == {"safe", "homog"}
    assert got["safe"].l_ok and got["safe"].n_sensitive == 2
    assert not got["homog"].l_ok and got["homog"].n_sensitive == 1


# -------------------------------------------------------------- NaiveBayes
def test_nb_classifies_separable_corpus(spark):
    from tokenkit_spark.ops.nbayes import nb_classify, nb_confusion

    docs = spark.createDataFrame(
        [
            (0, "spam", "buy cheap pills now"),
            (1, "spam", "cheap pills buy buy"),
            (2, "ham", "meeting notes agenda"),
            (3, "ham", "agenda for the meeting"),
        ],
        "doc_id long, source string, text string",
    )
    pred = {r.doc_id: r.predicted for r in nb_classify(docs).collect()}
    assert pred == {0: "spam", 1: "spam", 2: "ham", 3: "ham"}
    conf = {(r.label, r.predicted): r.n_docs
            for r in nb_confusion(docs).collect()}
    assert conf == {("spam", "spam"): 2, ("ham", "ham"): 2}


def test_nb_unseen_class_terms_penalized_not_dropped(spark):
    """A doc whose terms never occur in class c must still get a
    finite score for c (the -dl*ln(tokens_c+V) base), lower than the
    matching class."""
    from tokenkit_spark.ops.nbayes import nb_scores

    docs = spark.createDataFrame(
        [(0, "a", "x x x"), (1, "b", "y y y")],
        "doc_id long, source string, text string",
    )
    sc = {(r.doc_id, r.cls): r.score for r in
          nb_scores(docs, "source").collect()}
    assert len(sc) == 4  # every (doc, class) pair scored
    assert sc[(0, "a")] > sc[(0, "b")]
    assert sc[(1, "b")] > sc[(1, "a")]


# ----------------------------------------------------------- padding audit
def test_padding_audit_sorted_never_worse(spark):
    from tokenkit_spark.ops.packing import padding_audit

    docs = spark.createDataFrame(
        [(i, "w " * ((i * 7) % 23 + 1)) for i in range(100)],
        "doc_id long, text string",
    )
    rows = {r.strategy: r for r in
            padding_audit(docs, batch_size=8).collect()}
    assert rows["arrival"].real_tokens == rows["sorted"].real_tokens
    assert rows["sorted"].padded_slots <= rows["arrival"].padded_slots
    assert rows["sorted"].padding_frac <= rows["arrival"].padding_frac


def test_padding_audit_hand_values(spark):
    from tokenkit_spark.ops.packing import padding_audit

    # lens in arrival order: 1, 5, 2, 4 ; batch_size=2
    docs = spark.createDataFrame(
        [(0, "a"), (1, "a a a a a"), (2, "a a"), (3, "a a a a")],
        "doc_id long, text string",
    )
    rows = {r.strategy: r for r in
            padding_audit(docs, batch_size=2).collect()}
    # arrival: [1,5] pad to 10, [2,4] pad to 8 -> 18 slots, 12 real
    assert rows["arrival"].padded_slots == 18
    # sorted: [1,2] -> 4, [4,5] -> 10 -> 14 slots
    assert rows["sorted"].padded_slots == 14
    assert rows["arrival"].real_tokens == 12


# ------------------------------------------------------------ FIM transform
def test_fim_psm_split_and_ar_passthrough(spark):
    from tokenkit_spark.ops.spancorrupt import fim_transform

    docs = spark.createDataFrame(
        [(0, "A b c d e f"), (1, "g h i")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in fim_transform(docs).collect()}
    assert rows[0].mode == "psm"
    assert (rows[0].n_prefix, rows[0].n_middle, rows[0].n_suffix) == (2, 2, 2)
    assert rows[0].out_text == (
        "<fim_prefix> a b <fim_suffix> e f <fim_middle> c d"
    )
    assert rows[1].mode == "ar"
    assert rows[1].out_text == "g h i"
    assert (rows[1].n_prefix, rows[1].n_middle, rows[1].n_suffix) == (3, 0, 0)


# ------------------------------------------------------------ Z-order audit
def test_morton2_hand_values(spark):
    from tokenkit_spark.ops.zorder import morton2

    df = spark.createDataFrame(
        [(0, 0, 0), (1, 1, 0), (2, 0, 1), (3, 3, 5)],
        "id long, d1 long, d2 long",
    ).select("id", morton2(F.col("d1"), F.col("d2")).alias("z"))
    z = {r.id: r.z for r in df.collect()}
    # interleave: d1 odd bits, d2 even bits
    assert z[0] == 0 and z[1] == 2 and z[2] == 1
    # d1=3 (011) -> bits at 1,3 = 2+8; d2=5 (101) -> bits at 0,4 = 1+16
    assert z[3] == 2 + 8 + 1 + 16


def test_zorder_balances_both_dims(spark):
    from tokenkit_spark.ops.zorder import zorder_audit

    rows = spark.createDataFrame(
        [(i, i % 16, (i // 16) % 16) for i in range(1024)],
        "doc_id long, a long, b long",
    )
    got = {r.layout: r for r in
           zorder_audit(rows, "a", "b", rows_per_file=64).collect()}
    lin, zo = got["linear"], got["zorder"]
    assert lin.n_files == zo.n_files == 16
    # linear (sorted by a then b): perfect on a, useless on b
    assert lin.avg_files_d1 == 1.0
    assert lin.avg_files_d2 == 16.0
    # z-order: both dims prune to an intermediate file count
    assert zo.avg_files_d1 < 16.0 and zo.avg_files_d2 < 16.0
    assert zo.avg_files_mean < lin.avg_files_mean
