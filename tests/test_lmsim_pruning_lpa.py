"""LM/classic similarities (index/lmsim.py), static index pruning
(index/pruning.py), and label-propagation communities
(ops/communities.py) vs plain-Python references on tiny deterministic
inputs."""

import math

import pytest

DOCS = [
    (0, "spark sort merge join runs fast"),
    (1, "hash join beats sort merge on small tables"),
    (2, "window over stream stream stream"),
    (3, "scan the batch then scan again"),
    (4, "sort sort sort sort sort"),
]
QUERIES = [(0, "sort merge"), (1, "stream"), (2, "missing")]


def _stats():
    toks = {d: t.lower().split() for d, t in DOCS}
    tf = {}
    for d, ts in toks.items():
        for w in ts:
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dl = {d: len(ts) for d, ts in toks.items()}
    total = sum(dl.values())
    cf, df = {}, {}
    for (d, w), c in tf.items():
        cf[w] = cf.get(w, 0) + c
        df[w] = df.get(w, 0) + 1
    return tf, dl, total, cf, df, len(DOCS)


def _topk(scores, k=10):
    out = {}
    for (q, d), s in scores.items():
        out.setdefault(q, []).append((round(s, 4), d))
    ranked = {}
    for q, lst in out.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        ranked[q] = [(i + 1, d, s) for i, (s, d) in enumerate(lst[:k])]
    return ranked


def _ref_scores(per_term):
    tf, dl, total, cf, df, n = _stats()
    scores = {}
    for q, text in QUERIES:
        for w in sorted(set(text.lower().split())):
            for d, _ in DOCS:
                if (d, w) not in tf:
                    continue
                s = per_term(tf[(d, w)], dl[d], cf[w], df[w], total, n)
                scores[(q, d)] = scores.get((q, d), 0.0) + s
    return _topk(scores)


def _run(spark, fn, **kw):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, text string")
    rows = fn(docs, qs, **kw).collect()
    got = {}
    for r in rows:
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for q in got:
        got[q].sort()
    return got


def test_lm_dirichlet_matches_reference(spark):
    from tokenkit_spark.index.lmsim import lm_dirichlet

    mu = 50.0

    def per_term(tf, dl, cf, df, total, n):
        p = (cf + 1.0) / (total + 1.0)
        return max(math.log(1 + tf / (mu * p)) + math.log(mu / (dl + mu)), 0.0)

    assert _run(spark, lm_dirichlet, mu=mu) == _ref_scores(per_term)


def test_lm_jm_matches_reference(spark):
    from tokenkit_spark.index.lmsim import lm_jelinek_mercer

    lam = 0.7

    def per_term(tf, dl, cf, df, total, n):
        p = (cf + 1.0) / (total + 1.0)
        return max(math.log(1 + ((1 - lam) * tf / dl) / (lam * p)), 0.0)

    assert _run(spark, lm_jelinek_mercer, lam=lam) == _ref_scores(per_term)


def test_classic_tfidf_matches_reference(spark):
    from tokenkit_spark.index.lmsim import classic_tfidf

    def per_term(tf, dl, cf, df, total, n):
        idf = 1.0 + math.log(n / (df + 1.0))
        return math.sqrt(tf) * idf * idf / math.sqrt(dl)

    assert _run(spark, classic_tfidf) == _ref_scores(per_term)


def test_static_prune_keep_all_is_identity(spark):
    from tokenkit_spark.index.pruning import static_prune_eval

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, text string")
    rows = static_prune_eval(docs, qs, keep_per_term=10_000).collect()
    assert rows, "matched queries expected"
    for r in rows:
        assert r.n_full == r.n_pruned == r.overlap
        assert r.overlap_frac == 1.0


def test_static_prune_drops_low_tf_docs(spark):
    from tokenkit_spark.index.pruning import static_prune_eval

    # 'sort': doc 4 tf=5, doc 0 tf=1, doc 1 tf=1 -> keep_per_term=1
    # keeps only doc 4's posting; full top-k for query 0 includes
    # docs 0/1, so overlap must drop below 1 for query 0
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, text string")
    rows = {r.query_id: r for r in
            static_prune_eval(docs, qs, keep_per_term=1).collect()}
    assert rows[0].overlap < rows[0].n_full
    assert rows[0].overlap_frac < 1.0


EDGES = [
    # two cliques {0,1,2} and {10,11,12} bridged by one edge 2-10
    (0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10),
]


def test_lpa_separates_cliques(spark):
    from tokenkit_spark.ops.communities import label_propagation

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    labels = {r.node: r.label for r in
              label_propagation(edges, n_iter=4).collect()}
    assert labels[0] == labels[1] == labels[2]
    assert labels[10] == labels[11] == labels[12]
    assert labels[0] != labels[10]


def test_lpa_matches_python_reference(spark):
    from tokenkit_spark.ops.communities import label_propagation

    und = set()
    for a, b in EDGES:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({a for a, _ in und})
    lab = {v: v for v in nodes}
    for _ in range(4):
        new = {}
        for v in nodes:
            counts = {}
            for a, b in und:
                if a == v:
                    counts[lab[b]] = counts.get(lab[b], 0) + 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        lab = new

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.label for r in
           label_propagation(edges, n_iter=4).collect()}
    assert got == lab


def test_community_sizes_deterministic_order(spark):
    from tokenkit_spark.ops.communities import community_sizes

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    rows = community_sizes(edges, n_iter=4, k=20).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    sizes = [r.size for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert sum(sizes) == 6


FDOCS = [
    (0, "spark sort", "spark sort merge join runs fast"),
    (1, "hash join", "hash join beats sort merge on small tables"),
    (2, "stream window", "window over stream stream stream"),
    (3, "batch scan", "scan the batch then scan again"),
]


def test_combined_fields_matches_reference(spark):
    from tokenkit_spark.index.bm25f import combined_fields

    weights = {"title": 2.0, "body": 1.0}
    k1, b = 1.2, 0.75
    tf, dl = {}, {}
    for d, title, body in FDOCS:
        for fld, toks in (("title", title.split()), ("body", body.split())):
            w = weights[fld]
            dl[d] = dl.get(d, 0.0) + w * len(toks)
            for t in toks:
                tf[(d, t)] = tf.get((d, t), 0.0) + w
    n = len(FDOCS)
    avgdl = sum(dl.values()) / n
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1

    queries = [(0, "sort merge"), (1, "stream")]
    want = {}
    for q, text in queries:
        scores = {}
        for t in sorted(set(text.split())):
            for d, _, _ in FDOCS:
                if (d, t) not in tf:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                x = tf[(d, t)]
                sat = x * (k1 + 1) / (x + k1 * (1 - b + b * dl[d] / avgdl))
                scores[d] = scores.get(d, 0.0) + idf * sat
        ranked = sorted(
            ((round(s, 4), d) for d, s in scores.items()),
            key=lambda p: (-p[0], p[1]),
        )
        want[q] = [(i + 1, d, s) for i, (s, d) in enumerate(ranked[:10])]

    docs = spark.createDataFrame(FDOCS, "doc_id long, title string, body string")
    qs = spark.createDataFrame(queries, "query_id long, text string")
    got = {}
    for r in combined_fields(docs, qs, weights).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for q in got:
        got[q].sort()
    assert got == want


SPAN_DOCS = [
    # 'hash join' span containing 'merge'? big = hash..join slop 1
    (0, "hash merge join else"),          # span [0,2], merge at 1: contained
    (1, "hash join merge"),               # span [0,1], merge at 2: NOT inside
    (2, "merge hash stop join"),          # span [1,3], merge at 0: NOT inside
    (3, "hash stop stop join merge"),     # gap 2 > slop 1: no span
    (4, "no terms here"),
]


def test_span_containing_reference(spark):
    from tokenkit_spark.index.spans import span_containing_counts

    docs = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    rows = {r.doc_id: (r.n_spans, r.first_span)
            for r in span_containing_counts(
                docs, "hash join", "merge", slop=1).collect()}
    assert rows == {0: (1, 0)}


def test_span_within_reference(spark):
    from tokenkit_spark.index.spans import span_within_counts

    # little='merge' within big='hash join' spans
    docs = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    rows = {r.doc_id: (r.n_hits, r.first_pos)
            for r in span_within_counts(
                docs, "merge", "hash join", slop=1).collect()}
    assert rows == {0: (1, 1)}


def test_span_within_dedups_overlapping_bigs(spark):
    from tokenkit_spark.index.spans import span_within_counts

    # two overlapping 'a b' spans both contain the single 'x'... build:
    # positions: a(0) a(1) x(2) b(3) with slop 3 -> spans [0,3] and [1,3]
    docs = spark.createDataFrame(
        [(0, "a a x b")], "doc_id long, text string"
    )
    rows = span_within_counts(docs, "x", "a b", slop=3).collect()
    assert [(r.doc_id, r.n_hits, r.first_pos) for r in rows] == [(0, 1, 2)]


def test_span_or_merged_stream(spark):
    from tokenkit_spark.index.spans import span_or_counts

    docs = spark.createDataFrame(
        [(0, "sort hash sort x"), (1, "x y z"), (2, "hash")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.n_spans, r.n_terms_matched, r.first_pos)
            for r in span_or_counts(docs, ["sort", "hash"]).collect()}
    assert rows == {0: (3, 2, 0), 2: (1, 1, 0)}


def test_nfc_stats_detects_decomposed(spark):
    from tokenkit_spark.ops.webclean import nfc_stats

    docs = spark.createDataFrame(
        [(0, "caf\u00e9"), (1, "cafe\u0301"), (2, "plain")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.is_nfc, r.raw_len, r.nfc_len, r.delta_len)
            for r in nfc_stats(docs).collect()}
    assert rows[0] == (True, 4, 4, 0)
    assert rows[1] == (False, 5, 4, 1)
    assert rows[2] == (True, 5, 5, 0)


def test_nfc_stats_catches_reorder_without_length_change(spark):
    from tokenkit_spark.ops.webclean import nfc_stats

    # canonical ordering puts dot-below (ccc 220) before acute
    # (ccc 230); acute-then-dot is NOT NFC and normalizes to
    # U+1EB9 (e with dot below) + U+0301 — 3 codepoints -> 2
    s_wrong = "e\u0301\u0323"
    docs = spark.createDataFrame([(0, s_wrong)], "doc_id long, text string")
    r = nfc_stats(docs).collect()[0]
    assert r.is_nfc == False
    assert r.nfc_len == 2 and r.delta_len == 1


def test_ib_ll_matches_reference(spark):
    from tokenkit_spark.index.lmsim import ib_ll

    c = 1.0

    def per_term(tf, dl, cf, df, total, n):
        avgdl = total / n
        tfn = tf * math.log2(1 + c * avgdl / dl)
        lam = cf / n
        return math.log2((tfn + lam) / lam)

    assert _run(spark, ib_ll, c=c) == _ref_scores(per_term)


def test_lm_two_stage_matches_reference(spark):
    from tokenkit_spark.index.lmsim import lm_two_stage

    mu, lam = 50.0, 0.7

    def per_term(tf, dl, cf, df, total, n):
        pc = (cf + 1.0) / (total + 1.0)

        def num(x):
            return (1.0 - lam) * (x + mu * pc) / (dl + mu) + lam * pc

        return max(math.log(num(tf) / num(0.0)), 0.0)

    assert _run(spark, lm_two_stage, mu=mu, lam=lam) == _ref_scores(per_term)


def test_lm_two_stage_collapses_to_dirichlet_at_lam_zero(spark):
    # lam -> 0 reduces two-stage to pure Dirichlet's matched-term
    # delta: log(num(tf)/num(0)) = log(1 + tf/(mu*pc))
    from tokenkit_spark.index.lmsim import lm_two_stage

    mu = 50.0

    def per_term(tf, dl, cf, df, total, n):
        pc = (cf + 1.0) / (total + 1.0)
        return max(math.log(1 + tf / (mu * pc)), 0.0)

    got = _run(spark, lm_two_stage, mu=mu, lam=1e-12)
    ref = _ref_scores(per_term)
    assert set(got) == set(ref)
    for q in ref:
        assert [(r, d) for r, d, _ in got[q]] == [(r, d) for r, d, _ in ref[q]]
        for (_, _, a), (_, _, b) in zip(got[q], ref[q]):
            assert abs(a - b) < 1e-3
