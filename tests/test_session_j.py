"""Session-J operators: RM3 expansion, revisit-policy freshness audit,
posting-gap entropy audit."""

import math

from pyspark.sql import functions as F


# ------------------------------------------------------------------- RM3
def _rm3_corpus(spark):
    # "needle" co-occurs with "thread" in the feedback docs; doc 4
    # contains ONLY "thread" — retrievable by RM3, invisible to plain QL.
    return spark.createDataFrame(
        [
            (0, "needle thread sew fabric"),
            (1, "needle thread stitch"),
            (2, "needle hay stack"),
            (3, "rock paper scissors"),
            (4, "thread loom weave"),
        ],
        "doc_id long, text string",
    )


def test_rm3_expansion_contains_cooccurring_term(spark):
    from tokenkit_spark.index.rm3 import rm3_expansion_terms

    q = spark.createDataFrame([(0, "needle")], "query_id long, text string")
    rows = rm3_expansion_terms(
        _rm3_corpus(spark), q, fb_docs=3, fb_terms=5
    ).collect()
    terms = {r["term"] for r in rows}
    assert "thread" in terms
    # distribution renormalised over the clipped set
    assert abs(sum(r["p_rm"] for r in rows) - 1.0) < 1e-4


def test_rm3_retrieves_expansion_only_doc(spark):
    from tokenkit_spark.index.rm3 import rm3_search

    q = spark.createDataFrame([(0, "needle")], "query_id long, text string")
    rows = rm3_search(
        _rm3_corpus(spark), q, fb_docs=3, fb_terms=5, orig_weight=0.5, k=10
    ).collect()
    got = {r["doc_id"] for r in rows}
    assert 4 in got  # contains only the expansion term "thread"
    assert 3 not in got  # shares no term with original or expanded query
    # original-term docs still outrank the expansion-only doc
    by_doc = {r["doc_id"]: r["rank"] for r in rows}
    assert by_doc[0] < by_doc[4] and by_doc[1] < by_doc[4]


def test_rm3_oov_query_returns_empty(spark):
    from tokenkit_spark.index.rm3 import rm3_search

    q = spark.createDataFrame(
        [(0, "zzzunseen")], "query_id long, text string"
    )
    assert rm3_search(_rm3_corpus(spark), q).count() == 0


def test_rm3_alpha_one_reduces_to_query_likelihood(spark):
    from tokenkit_spark.index.rm3 import rm3_search

    docs = _rm3_corpus(spark)
    q = spark.createDataFrame([(0, "needle")], "query_id long, text string")
    rows = rm3_search(docs, q, fb_docs=3, fb_terms=5, orig_weight=1.0).collect()
    # with alpha=1 the expanded query is the original distribution, so
    # only docs containing "needle" can match, ranked by smoothed QL
    assert {r["doc_id"] for r in rows} == {0, 1, 2}


# -------------------------------------------------- revisit policy audit
def test_revisit_policy_uniform_dominates(spark):
    from tokenkit_spark.ops.recrawl import revisit_policy_audit

    # heavy-tailed change rates: one hot page, many cold ones
    rows = []
    eid = 0
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    for d in range(100):  # page 0 changes ~10x/day
        for j in range(10):
            rows.append((eid, base + dt.timedelta(days=d, minutes=j), 0))
            eid += 1
    for p in range(1, 21):  # pages 1..20 change ~every 10 days
        for d in range(0, 100, 10):
            rows.append((eid, base + dt.timedelta(days=d, hours=p), p))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = {r["policy"]: r for r in revisit_policy_audit(ev).collect()}
    assert set(out) == {"uniform", "proportional"}
    # Cho & Garcia-Molina: uniform allocation dominates proportional
    assert out["uniform"]["mean_freshness"] > out["proportional"]["mean_freshness"]
    # proportional with B = sum(lambda) gives f_i = lambda_i for every
    # page -> freshness identically 1 - e^-1
    expected = 1.0 - math.exp(-1.0)
    assert abs(out["proportional"]["mean_freshness"] - expected) < 1e-4
    assert abs(out["proportional"]["min_freshness"] - expected) < 1e-4


# ---------------------------------------------------- gap entropy audit
def test_gap_entropy_dense_term_hits_zero_floor(spark):
    from tokenkit_spark.index.gapentropy import gap_entropy_audit

    # term "a": docs 0..63 consecutively -> every gap is 1 except the
    # first (0 - 0 ... actually first gap = id - 0 = 0 for doc 0) —
    # use docs 1..64 so the first gap is also 1: entropy floor 0 bits
    rows = [("a", i) for i in range(1, 65)]
    p = spark.createDataFrame(rows, "term string, doc_id long")
    out = {r["df_bucket"]: r for r in gap_entropy_audit(p).collect()}
    b = out[6]  # floor(log2(64)) = 6
    assert b["n_terms"] == 1 and b["n_gaps"] == 64
    assert b["h_bits"] == 0.0
    assert b["varint_bits"] == 8.0  # 1-byte varint per gap
    assert b["headroom"] > 1000  # byte alignment vs zero-entropy floor


def test_gap_entropy_uniform_gaps(spark):
    from tokenkit_spark.index.gapentropy import gap_entropy_audit

    # two equally likely gap values -> exactly 1 bit of entropy
    ids, cur = [], 0
    for i in range(32):
        cur += 1 if i % 2 == 0 else 1000
        ids.append(cur)
    p = spark.createDataFrame(
        [("t", i) for i in ids], "term string, doc_id long"
    )
    out = gap_entropy_audit(p).collect()
    assert len(out) == 1
    # gap=1 x16, gap=1000 x16 -> H = 1 bit; varint = (16*8 + 16*16)/32 = 12
    assert out[0]["h_bits"] == 1.0
    assert out[0]["varint_bits"] == 12.0
