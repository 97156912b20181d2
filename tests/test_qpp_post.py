"""Post-retrieval QPP (Clarity/WIG/NQC) vs a brute-force numpy
replication of the cited formulas on a tiny corpus, and bpref on
hand-computed trec_eval cases."""

import math

from tokenkit_spark.index.qpp_post import post_retrieval_qpp
from tokenkit_spark.index.rankeval import bpref


def test_qpp_post_matches_bruteforce(spark):
    corpus = {
        1: "big data systems run big jobs",
        2: "data pipelines move data",
        3: "cats sleep all day long",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(0, "big data")], "query_id long, text string"
    )
    mu, lam = 10.0, 0.6
    row = post_retrieval_qpp(
        docs, queries, mu=mu, k_fb=2, lam=lam
    ).collect()[0]

    # brute force
    toks = {d: t.split() for d, t in corpus.items()}
    T = sum(len(v) for v in toks.values())
    cf = {}
    for v in toks.values():
        for t in v:
            cf[t] = cf.get(t, 0) + 1
    qt = ["big", "data"]

    def ql(d):
        return sum(
            math.log(
                (toks[d].count(t) + mu * cf[t] / T) / (len(toks[d]) + mu)
            )
            for t in qt
        )

    # candidates: docs 1, 2 (doc 3 matches no query term)
    scores = sorted(
        [(round(ql(d), 6), -d) for d in (1, 2)], reverse=True
    )
    top = [(-negd, s) for s, negd in scores][:2]
    s_coll = sum(math.log(cf[t] / T) for t in qt)
    m = len(qt)
    mean_s = sum(s for _, s in top) / len(top)
    wig = (mean_s - s_coll) / math.sqrt(m)
    std = math.sqrt(sum((s - mean_s) ** 2 for _, s in top) / len(top))
    nqc = std / abs(s_coll)
    mx = max(s for _, s in top)
    w = {d: math.exp(s - mx) for d, s in top}
    z = sum(w.values())
    p_dq = {d: w[d] / z for d in w}
    vocab = set(cf)
    clarity = 0.0
    for t in vocab:
        p_rel = sum(
            p_dq.get(d, 0) * toks[d].count(t) / len(toks[d]) for d in p_dq
        )
        p_wq = lam * p_rel + (1 - lam) * cf[t] / T
        clarity += p_wq * math.log2(p_wq / (cf[t] / T))

    assert row.n_terms == 2
    assert abs(row.wig - wig) < 2e-6
    assert abs(row.nqc - nqc) < 2e-6
    assert abs(row.clarity - clarity) < 2e-6
    assert clarity >= 0  # KL of proper distributions


def test_bpref_hand_case(spark):
    # query 0: ranks 1..5 = [rel, nonrel, unjudged, rel, nonrel]
    # R=3 (one relevant unretrieved), N=2.
    results = spark.createDataFrame(
        [(0, r, 10 + r) for r in range(1, 6)],
        "query_id long, rank long, doc_id long",
    )
    judgments = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 0), (0, 14, 2), (0, 15, 0), (0, 99, 1)],
        "query_id long, doc_id long, grade long",
    )
    r = bpref(results, judgments, k=5).collect()[0]
    # rank1: 0 nonrel above -> 1 - 0/2; rank4: 1 nonrel above -> 1 - 1/2
    expect = (1.0 + 0.5) / 3
    assert abs(r.bpref - expect) < 2e-6
    assert abs(r.judged_k - 4 / 5) < 2e-6


def test_bpref_no_nonrelevant_convention(spark):
    # trec_eval: min(R, N) = 0 -> each relevant retrieved contributes 1
    results = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11)], "query_id long, rank long, doc_id long"
    )
    judgments = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, grade long"
    )
    r = bpref(results, judgments, k=10).collect()[0]
    assert abs(r.bpref - 1.0) < 2e-6
    assert r.judged_k == 1.0
