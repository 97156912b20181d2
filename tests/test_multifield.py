"""Multi-field BM25 with boosts: score must equal a pure-Python
per-field BM25 recompute (field-specific df/N/avgdl, boost-weighted sum).
Lucene per-field semantics: a doc whose field is EMPTY does not count
toward that field's N or avgdl (no doc_stats row is built for it), so
the brute force computes each field's stats over non-empty docs only."""

import math

import pytest

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.query import bm25_multifield

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)
K1, B = 1.2, 0.75

WORDS = ["data", "spark", "index", "merge", "query", "shard", "block",
         "scan", "join", "sort", "hash", "table"]


def _corpus():
    rows = []
    for i in range(40):
        toks = [WORDS[(i * 7 + j * 3) % len(WORDS)] for j in range(2 + (i % 9))]
        rows.append((i, " ".join(toks)))
    return rows


def _fields(text):
    toks = text.split()
    return " ".join(toks[:3]), " ".join(toks[3:])  # title, body (may be "")


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    rows = _corpus()
    title = spark.createDataFrame(
        [(i, _fields(t)[0]) for i, t in rows], "doc_id long, text string"
    )
    body = spark.createDataFrame(
        [(i, _fields(t)[1]) for i, t in rows], "doc_id long, text string"
    )
    root = tmp_path_factory.mktemp("mfidx")
    build_index(spark, title, str(root / "title"), CFG, n_shards=4, n_buckets=8)
    build_index(spark, body, str(root / "body"), CFG, n_shards=4, n_buckets=8)
    return {
        "title": load_index(spark, str(root / "title")),
        "body": load_index(spark, str(root / "body")),
    }


def _brute(rows, queries, boosts, k=10):
    fields = {}
    for fi, f in enumerate(["title", "body"]):
        toks = {i: v for i, t in rows if (v := _fields(t)[fi].split())}
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        df = {}
        for v in toks.values():
            for t in set(v):
                df[t] = df.get(t, 0) + 1
        fields[f] = (toks, n, avgdl, df)
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in set(qtext.split()):
            for f, (toks, n, avgdl, df) in fields.items():
                if term not in df:
                    continue
                idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
                for d, v in toks.items():
                    tf = v.count(term)
                    if tf:
                        norm = tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(v) / avgdl))
                        scores[d] = scores.get(d, 0.0) + boosts[f] * idf * norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, round(s, 9)) for d, s in ranked]
    return out


def test_multifield_matches_brute(spark, indexes):
    rows = _corpus()
    queries = [(0, "spark index"), (1, "hash"), (2, "data join sort"), (3, "zzz")]
    boosts = {"title": 2.0, "body": 1.0}
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = {}
    for r in bm25_multifield(spark, indexes, boosts, qdf, CFG, k=10).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    want = _brute(rows, queries, boosts)
    for qid, ranked in want.items():
        expect = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
        assert sorted(got.get(qid, [])) == expect, f"query {qid}"
    assert 3 not in got  # no-hit query yields nothing

    # boost sensitivity: title-heavy boost must be able to reorder
    flat = bm25_multifield(spark, indexes, {"title": 1.0, "body": 1.0}, qdf, CFG).collect()
    want_flat = _brute(rows, queries, {"title": 1.0, "body": 1.0})
    got_flat = {}
    for r in flat:
        got_flat.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, ranked in want_flat.items():
        expect = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
        assert sorted(got_flat.get(qid, [])) == expect


def test_multifield_validation(spark, indexes, tmp_path_factory):
    qdf = spark.createDataFrame([(0, "spark")], "query_id long, text string")
    with pytest.raises(ValueError, match="no field indexes"):
        bm25_multifield(spark, {}, {}, qdf, CFG)
    other = tmp_path_factory.mktemp("mfbad")
    docs = spark.createDataFrame([(0, "spark data")], "doc_id long, text string")
    build_index(spark, docs, str(other / "idx"), CFG, n_shards=2, n_buckets=8)
    bad = dict(indexes, extra=load_index(spark, str(other / "idx")))
    with pytest.raises(ValueError, match="n_shards"):
        bm25_multifield(spark, bad, {}, qdf, CFG)


def test_dis_max_matches_brute(spark, indexes):
    """dis_max: per-field scores computed independently, combined as
    best + tie_breaker*(rest); tie_breaker=1 equals the summed
    most_fields mode; bad tie_breaker raises."""
    from tokenkit_spark.index.query import dis_max

    rows = _corpus()
    queries = [(0, "spark join"), (1, "data"), (2, "zzz missing")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    boosts = {"title": 2.0, "body": 1.0}
    tb = 0.3

    # brute: per-field scores, then dis_max combine
    fields = {}
    for fi, f in enumerate(["title", "body"]):
        toks = {i: v for i, t in rows if (v := _fields(t)[fi].split())}
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        df = {}
        for v in toks.values():
            for t in set(v):
                df[t] = df.get(t, 0) + 1
        fields[f] = (toks, n, avgdl, df)
    want = {}
    for qid, qtext in queries:
        per_field = {}
        for term in set(qtext.split()):
            for f, (toks, n, avgdl, df) in fields.items():
                if term not in df:
                    continue
                idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
                for d, v in toks.items():
                    tf = v.count(term)
                    if tf:
                        norm = tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(v) / avgdl))
                        per_field.setdefault(d, {}).setdefault(f, 0.0)
                        per_field[d][f] += boosts[f] * idf * norm
        scores = {
            d: max(fs.values()) + tb * (sum(fs.values()) - max(fs.values()))
            for d, fs in per_field.items()
        }
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
        want[qid] = [(i + 1, d, round(s, 6)) for i, (d, s) in enumerate(ranked)]

    got = dis_max(spark, indexes, qdf, tie_breaker=tb, boosts=boosts,
                  config=CFG, k=10, round_digits=6)
    got_by_q = {}
    for r in got.collect():
        got_by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 6)))
    for qid in (0, 1):
        assert sorted(got_by_q[qid]) == want[qid]
    assert 2 not in got_by_q

    # tie_breaker=1 == summed most_fields mode
    summed = bm25_multifield(spark, indexes, boosts, qdf, CFG, k=10, round_digits=6)
    tb1 = dis_max(spark, indexes, qdf, tie_breaker=1.0, boosts=boosts,
                  config=CFG, k=10, round_digits=6)
    assert sorted(map(tuple, summed.collect())) == sorted(map(tuple, tb1.collect()))

    with pytest.raises(ValueError, match="tie_breaker"):
        dis_max(spark, indexes, qdf, tie_breaker=1.5)
