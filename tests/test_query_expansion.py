"""Query-expansion search paths: fuzzy (Levenshtein<=1 via SymSpell
deletion-neighbourhood join), prefix, wildcard, and boolean query trees.
Each is verified against a pure-Python brute-force recompute over the
same corpus, and fuzzy/prefix/wildcard scoring must be IDENTICAL to the
plain segment path run on the pre-expanded term set."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.query import (
    analyze_queries,
    bm25_segments,
    bm25_segments_fuzzy,
    bm25_segments_prefix,
    bm25_segments_wildcard,
    boolean_search,
    expand_pattern_terms,
    fuzzy_expand_terms,
    suggest_terms,
)
from tokenkit_spark.sources.pages import pages_to_docs, synth_pages

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)


@pytest.fixture(scope="module")
def docs(spark):
    return pages_to_docs(synth_pages(spark, n_docs=400, seed=7)).cache()


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xidx") / "index")
    build_index(spark, docs, path, CFG, n_shards=4, n_buckets=8)
    return load_index(spark, path)


@pytest.fixture(scope="module")
def vocab(index):
    return {r.term: r.df for r in index["term_stats"].collect()}


def _lev(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > 1:  # cheap bound, enough for d<=1 checks
        return 2
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _mutated_queries(vocab):
    """Deterministic misspellings of real dictionary terms."""
    words = sorted(t for t in vocab if t.isalpha() and 4 <= len(t) <= 9)
    picks = words[:: max(1, len(words) // 4)][:4]
    qs = []
    for i, w in enumerate(picks):
        qs.append((i, w[:-1]))           # deletion
    qs.append((len(qs), picks[0] + "q"))  # insertion
    qs.append((len(qs), "zzqxj"))         # no match
    return qs


def test_fuzzy_expansion_matches_brute(spark, index, vocab):
    qs = _mutated_queries(vocab)
    qdf = spark.createDataFrame(qs, "query_id long, text string")
    got = {
        (r.query_id, r.term)
        for r in fuzzy_expand_terms(
            index, analyze_queries(qdf, CFG), max_expansions=10**6
        ).collect()
    }
    want = {
        (qid, t) for qid, q in qs for t in vocab if _lev(q, t) <= 1
    }
    assert got == want
    assert any(qid == 0 for qid, _t in got)  # mutations actually expand
    assert not any(qid == qs[-1][0] for qid, _t in got)  # zzqxj matches nothing


def test_fuzzy_cap_keeps_highest_df(spark, index, vocab):
    qs = _mutated_queries(vocab)[:2]
    qdf = spark.createDataFrame(qs, "query_id long, text string")
    full = fuzzy_expand_terms(index, analyze_queries(qdf, CFG), max_expansions=10**6)
    capped = {
        (r.query_id, r.term)
        for r in fuzzy_expand_terms(
            index, analyze_queries(qdf, CFG), max_expansions=1
        ).collect()
    }
    by_q = {}
    for r in full.collect():
        by_q.setdefault(r.query_id, []).append(r.term)
    for qid, terms in by_q.items():
        best = sorted(terms, key=lambda t: (-vocab[t], t))[0]
        assert (qid, best) in capped
    assert len(capped) == len(by_q)  # exactly one per (query, qterm)


def test_fuzzy_scoring_equals_plain_on_expanded(spark, index, vocab):
    """bm25_segments_fuzzy == bm25_segments run on a query whose text IS
    the expanded term set (rank and score identical)."""
    qs = _mutated_queries(vocab)
    qdf = spark.createDataFrame(qs, "query_id long, text string")
    expanded = fuzzy_expand_terms(index, analyze_queries(qdf, CFG)).collect()
    by_q = {}
    for r in expanded:
        by_q.setdefault(r.query_id, []).append(r.term)
    plain_qdf = spark.createDataFrame(
        [(q, " ".join(sorted(ts))) for q, ts in by_q.items()],
        "query_id long, text string",
    )
    a = bm25_segments_fuzzy(spark, index, qdf, CFG, k=10).collect()
    b = bm25_segments(spark, index, plain_qdf, CFG, k=10).collect()
    norm = lambda rows: sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows
    )
    assert norm(a) == norm(b)
    assert a  # fuzzy queries really rank docs


def test_prefix_and_wildcard_expansion_match_brute(spark, index, vocab):
    words = sorted(t for t in vocab if t.isalpha() and len(t) >= 5)
    w0 = words[0]
    pats_pre = [(0, w0[:3]), (1, w0[:1] + " " + words[-1][:2]), (2, "zzqx")]
    pdf = spark.createDataFrame(pats_pre, "query_id long, text string")
    got = {
        (r.query_id, r.term)
        for r in expand_pattern_terms(spark, index, pdf, "prefix").collect()
    }
    want = {
        (qid, t)
        for qid, pat in pats_pre
        for tok in pat.split()
        for t in vocab
        if t.startswith(tok)
    }
    assert got == want and got

    pats_wc = [(0, w0[0] + "?" + w0[2:]), (1, "*" + w0[-3:]), (2, w0[:2] + "*"), (3, "zz*qx")]
    wdf = spark.createDataFrame(pats_wc, "query_id long, text string")
    got_wc = {
        (r.query_id, r.term)
        for r in expand_pattern_terms(spark, index, wdf, "wildcard").collect()
    }
    import re

    def wc_match(pat, t):
        rx = "^" + re.escape(pat).replace(r"\*", ".*").replace(r"\?", ".") + "$"
        return re.match(rx, t) is not None

    want_wc = {
        (qid, t)
        for qid, pat in pats_wc
        for tok in pat.split()
        for t in vocab
        if wc_match(tok, t)
    }
    assert got_wc == want_wc and got_wc
    # scoring parity through both rewrite paths
    a = bm25_segments_prefix(spark, index, pdf, k=5).collect()
    assert a and all(r.rank <= 5 for r in a)
    b = bm25_segments_wildcard(spark, index, wdf, k=5).collect()
    assert b and all(r.rank <= 5 for r in b)


def test_suggest_terms_matches_brute(spark, index, vocab):
    """Top-n df-ranked distance-1 suggestions == brute Levenshtein scan;
    the query term itself (distance 0) is never suggested."""
    qs = _mutated_queries(vocab)
    # add a query that IS a dictionary term: its own entry must not appear
    exact = sorted(vocab)[0]
    qs.append((len(qs), exact))
    qdf = spark.createDataFrame(qs, "query_id long, text string")
    got = {}
    for r in suggest_terms(spark, index, qdf, CFG, n=3).collect():
        assert 1 <= r.rank <= 3 and r.dist == 1
        got.setdefault((r.query_id, r.qterm), []).append(
            (r.rank, r.suggestion, r.df)
        )
    for qid, q in qs:
        cand = sorted(
            ((t, d) for t, d in vocab.items() if _lev(q, t) == 1),
            key=lambda td: (-td[1], td[0]),
        )[:3]
        want = [(i + 1, t, d) for i, (t, d) in enumerate(cand)]
        assert sorted(got.get((qid, q), [])) == want, f"query {q!r}"
    assert any((qid, exact) in got for qid, q in qs if q == exact) or not any(
        _lev(exact, t) == 1 for t in vocab
    )  # exact term still gets *other* suggestions when neighbours exist
    assert all(
        s != q for (qid, q), rows in got.items() for _rk, s, _d in rows
    )  # never suggests the term itself


def test_boolean_search_matches_brute(spark, index, docs, vocab):
    top = [t for t, _df in sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:4]]
    t1, t2, t3, t4 = top
    expr = ("and", [
        ("or", [("and", [("term", t1), ("term", t2)]), ("term", t3)]),
        ("not", ("term", t4)),
    ])
    got = {r.doc_id for r in boolean_search(spark, index, expr, CFG).collect()}

    sets = {t: set() for t in top}
    for r in docs.select("doc_id", "text").collect():
        toks = set(r.text.lower().split())
        for t in top:
            if t in toks:
                sets[t].add(r.doc_id)
    want = ((sets[t1] & sets[t2]) | sets[t3]) - sets[t4]
    assert got == want and got

    # top-level NOT complements against the universe
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    got_not = {
        r.doc_id
        for r in boolean_search(spark, index, ("not", ("term", t1)), CFG).collect()
    }
    assert got_not == all_ids - sets[t1]

    with pytest.raises(ValueError, match="unknown op"):
        boolean_search(spark, index, ("xor", [("term", t1)]), CFG)


def test_more_like_this_matches_brute(spark, docs, index):
    """MLT == brute recompute: per seed, top-10 terms by 6-dp-rounded
    tf*idf (ties term asc) run as a disjunctive BM25 query with the seed
    excluded; compared against a pure-Python recompute over the corpus."""
    import math
    from collections import Counter

    from tokenkit_spark.index.query import more_like_this

    rows = docs.select("doc_id", "text").collect()
    corpus = {r.doc_id: [t for t in r.text.lower().split() if t] for r in rows}
    n = len(corpus)
    df = Counter(t for toks in corpus.values() for t in set(toks))
    avgdl = sum(len(v) for v in corpus.values()) / n

    def idf(t):
        return math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))

    seed_ids = sorted(corpus)[:3]
    seeds = docs.filter(F.col("doc_id").isin(seed_ids)).select("doc_id", "text")
    got = {}
    for r in more_like_this(spark, index, seeds, CFG, k=10, round_digits=4).collect():
        assert r.doc_id != r.query_id  # the seed is never its own result
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))

    for sid in seed_ids:
        tf = Counter(corpus[sid])
        qterms = sorted(
            tf, key=lambda t: (-round(tf[t] * idf(t), 6), t)
        )[:10]
        scored = []
        for d, toks in corpus.items():
            if d == sid:
                continue
            dtf = Counter(toks)
            s = sum(
                idf(t) * dtf[t] * 2.2 / (dtf[t] + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
                for t in qterms
                if dtf[t]
            )
            if s > 0:
                scored.append((round(s, 4), d))
        want = [
            (i + 1, d, s)
            for i, (s, d) in enumerate(
                sorted(scored, key=lambda x: (-x[0], x[1]))[:10]
            )
        ]
        assert got[sid] == want, f"seed {sid}"


def test_regexp_expansion_matches_brute(spark, index, vocab):
    import re

    from tokenkit_spark.index.query import expand_pattern_terms

    words = sorted(t for t in vocab if t.isalpha() and len(t) >= 4)
    pats = [
        (0, words[0][:-1] + "."),
        (1, f"({words[1]}|{words[2]})"),
        (2, "qqqqzz.*"),
    ]
    qdf = spark.createDataFrame(pats, "query_id long, text string")
    got = {}
    for r in expand_pattern_terms(spark, index, qdf, "regexp").collect():
        got.setdefault(r.query_id, set()).add(r.term)
    for qid, p in pats:
        want = {t for t in vocab if re.fullmatch(p, t)}
        assert got.get(qid, set()) == want, p


def test_paged_search_is_rank_slice(spark, index, vocab):
    from tokenkit_spark.index.query import bm25_segments, bm25_segments_paged

    words = sorted(vocab, key=lambda t: -vocab[t])  # head terms: >=9 hits
    qdf = spark.createDataFrame(
        [(0, " ".join(words[:2])), (1, words[2])], "query_id long, text string"
    )
    full = sorted(
        map(tuple, bm25_segments(spark, index, qdf, CFG, k=9, round_digits=4).collect())
    )
    pages = []
    for page in (1, 2, 3):
        rows = [
            tuple(r)
            for r in bm25_segments_paged(
                spark, index, qdf, CFG, page=page, size=3, round_digits=4
            ).collect()
        ]
        # every page row's global rank lands in the page window
        assert all((page - 1) * 3 < r[1] <= page * 3 for r in rows)
        pages += rows
    assert sorted(pages) == full  # pages stitch exactly into the full top-9


def test_term_vectors_matches_brute(spark, index, docs):
    from collections import Counter

    from tokenkit_spark.index.query import term_vectors

    seed = docs.orderBy("doc_id").limit(2).select("doc_id", "text")
    rows = seed.collect()
    out = {
        (r.doc_id, r.term): r
        for r in term_vectors(index, seed, CFG).collect()
    }
    alldocs = {r.doc_id: r.text.lower().split() for r in docs.collect()}
    df = Counter(t for toks in alldocs.values() for t in set(toks))
    for r in rows:
        toks = [t for t in r.text.lower().split() if t]
        tf = Counter(toks)
        for t, n in tf.items():
            got = out[(r.doc_id, t)]
            assert got.tf == n
            assert got.positions == ",".join(
                str(i) for i, w in enumerate(toks) if w == t
            )
            assert got.df == df[t]
    assert len(out) == sum(len(set(r.text.lower().split())) for r in rows)


def test_prf_matches_brute(spark, docs, index, vocab):
    """Two-stage PRF == pure-Python recompute: stage-1 top-3, summed
    tf*idf expansion top-5, union, rescore."""
    import math
    from collections import Counter

    from tokenkit_spark.index.query import bm25_segments_prf

    corpus = {
        r.doc_id: [t for t in r.text.lower().split() if t]
        for r in docs.select("doc_id", "text").collect()
    }
    n = len(corpus)
    dfc = Counter(t for toks in corpus.values() for t in set(toks))
    avgdl = sum(len(v) for v in corpus.values()) / n

    def idf(t):
        return math.log(1 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))

    def score(qterms, exclude=None):
        out = []
        for d, toks in corpus.items():
            dtf = Counter(toks)
            s = sum(
                idf(t) * dtf[t] * 2.2 / (dtf[t] + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
                for t in qterms if dtf[t]
            )
            if s > 0:
                out.append((round(s, 4), d))
        return sorted(out, key=lambda x: (-x[0], x[1]))

    words = sorted(vocab, key=lambda t: -vocab[t])
    qs = [(0, f"{words[0]} {words[3]}"), (1, words[5])]
    qdf = spark.createDataFrame(qs, "query_id long, text string")
    got = {}
    for r in bm25_segments_prf(
        spark, index, docs, qdf, CFG, k=10, fb_docs=3, fb_terms=5, round_digits=4
    ).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))

    for qid, text in qs:
        q0 = set(text.split())
        fb_ids = [d for _s, d in score(q0)[:3]]
        fbtf = Counter()
        for d in fb_ids:
            fbtf.update(corpus[d])
        sel = sorted(fbtf, key=lambda t: (-round(fbtf[t] * idf(t), 6), t))[:5]
        want = [
            (i + 1, d, s) for i, (s, d) in enumerate(score(q0 | set(sel))[:10])
        ]
        assert got[qid] == want, qid
