"""BM25F and SynonymQuery scoring (index/bm25f.py) vs plain-Python
reference implementations on a tiny deterministic corpus, plus the
ip_prefix / has_parent aggs added alongside them."""

import math

import pytest

from tokenkit_spark.index.bm25f import bm25f, synonym_search

DOCS = [
    (0, "spark sort", "spark sort merge join runs fast"),
    (1, "hash join", "hash join beats sort merge on small tables"),
    (2, "stream window", "window over stream stream stream"),
    (3, "batch scan", "scan the batch then scan again"),
]
QUERIES = [(0, "sort merge"), (1, "stream"), (2, "missing")]
FIELDS = {"title": (2.0, 0.75), "body": (1.0, 0.4)}
K1 = 1.2


def _tok(s):
    return s.lower().split()


def _ref_bm25f():
    # per-field stats
    field_docs = {
        "title": {d: _tok(t) for d, t, _ in DOCS},
        "body": {d: _tok(b) for d, _, b in DOCS},
    }
    avgdl = {
        f: sum(len(v) for v in m.values()) / len(m) for f, m in field_docs.items()
    }
    n_docs = len(DOCS)
    # pseudo-tf
    ptf = {}  # (doc, term) -> value
    seen = {}  # term -> set(docs)
    for f, (w, b) in FIELDS.items():
        for d, toks in field_docs[f].items():
            dl = len(toks)
            for t in set(toks):
                tf = toks.count(t)
                ptf[(d, t)] = ptf.get((d, t), 0.0) + w * tf / (
                    1 - b + b * dl / avgdl[f]
                )
                seen.setdefault(t, set()).add(d)
    out = {}
    for qid, qtext in QUERIES:
        scores = {}
        for t in set(_tok(qtext)):
            if t not in seen:
                continue
            idf = math.log(
                1 + (n_docs - len(seen[t]) + 0.5) / (len(seen[t]) + 0.5)
            )
            for d in range(n_docs):
                v = ptf.get((d, t))
                if v:
                    scores[d] = scores.get(d, 0.0) + idf * v / (K1 + v)
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0])
        )
        out[qid] = [
            (r + 1, d, round(s, 4)) for r, (d, s) in enumerate(ranked[:10])
        ]
    return out


def test_bm25f_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, title string, body string")
    qs = spark.createDataFrame(QUERIES, "query_id long, text string")
    got = {
        qid: [(r, d, s) for _, r, d, s in rows]
        for qid, rows in _group(bm25f(docs, qs, FIELDS).collect()).items()
    }
    want = {qid: rows for qid, rows in _ref_bm25f().items() if rows}
    assert got == want


def _group(rows):
    out = {}
    for row in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        out.setdefault(row.query_id, []).append(
            (row.query_id, row.rank, row.doc_id, row.score)
        )
    return out


def test_bm25f_title_weight_boosts_title_hits(spark):
    # same body tf, but doc 0 also has the term in its (weighted) title
    docs = spark.createDataFrame(
        [
            (0, "alpha", "alpha beta gamma delta"),
            (1, "other", "alpha beta gamma delta"),
        ],
        "doc_id long, title string, body string",
    )
    qs = spark.createDataFrame([(0, "alpha")], "query_id long, text string")
    rows = bm25f(docs, qs, FIELDS).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [0, 1]
    assert rows[0].score > rows[1].score


def test_synonym_query_semantics(spark):
    # 'fast' and 'quick' are synonyms: a doc with either matches, tf sums,
    # df is the MAX variant df (not the sum) so idf stays the common term's
    docs = spark.createDataFrame(
        [
            (0, "fast fast car"),
            (1, "quick car"),
            (2, "slow car"),
            (3, "fast quick run"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "fast")], "query_id long, text string")
    syn = spark.createDataFrame(
        [("fast", "quick")], "term string, variant string"
    )
    rows = synonym_search(docs, qs, syn).orderBy("rank").collect()
    hit = {r.doc_id for r in rows}
    assert hit == {0, 1, 3}
    # reference score: df_syn = max(df(fast)=2, df(quick)=2) = 2, N=4
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    avgdl = (3 + 2 + 2 + 3) / 4
    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    want = {0: round(s(2, 3), 4), 1: round(s(1, 2), 4), 3: round(s(2, 3), 4)}
    got = {r.doc_id: r.score for r in rows}
    assert got == pytest.approx(want)


def test_ip_prefix_agg(spark):
    from tokenkit_spark.ops.aggs import ip_prefix_agg

    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.15.200",), ("10.0.16.1",), ("192.168.1.1",)],
        "ip string",
    )
    got = {r.prefix: r.doc_count for r in ip_prefix_agg(df, "ip", 20).collect()}
    assert got == {"10.0.0.0/20": 2, "10.0.16.0/20": 1, "192.168.0.0/20": 1}


def test_has_parent(spark):
    from tokenkit_spark.ops.aggs import has_parent

    parents = spark.createDataFrame(
        [(1, "en"), (2, "de")], "doc_id long, lang string"
    ).filter("lang = 'en'")
    children = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "cid long, pid long"
    )
    got = sorted(
        r.cid for r in has_parent(parents, children, "doc_id", "pid").collect()
    )
    assert got == [10, 11]


def test_bm25_plus_delta_zero_is_bm25_and_floor_works(spark):
    from tokenkit_spark.index.bm25f import bm25_plus

    docs = spark.createDataFrame(
        [(0, "apple " + "filler " * 50), (1, "apple pie"), (2, "other words")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "apple")], "query_id long, text string")
    plain = {r.doc_id: r.score for r in bm25_plus(docs, qs, delta=0.0).collect()}
    plus = {r.doc_id: r.score for r in bm25_plus(docs, qs, delta=1.0).collect()}
    assert set(plain) == set(plus) == {0, 1}
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    # delta adds exactly idf per matched term
    for d in plain:
        assert plus[d] == pytest.approx(plain[d] + round(idf, 10), abs=2e-4)
    # the long matching doc keeps a meaningful floor: score > idf*delta
    assert plus[0] > idf
