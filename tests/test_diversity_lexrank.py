"""alpha-DCG / ERR-IA and LexRank on hand-computed cases."""

import math

from tokenkit_spark.index.rankeval import diversity_eval
from tokenkit_spark.ops.lexrank import lexrank


def test_diversity_eval_hand_case(spark):
    # ranks: 1=docA{a0}, 2=docB{a0,a1}, 3=docC{} (unjudged)
    results = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12)],
        "query_id long, rank long, doc_id long",
    )
    aj = spark.createDataFrame(
        [(0, 10, 0), (0, 11, 0), (0, 11, 1), (0, 99, 2)],
        "query_id long, doc_id long, aspect long",
    )
    r = diversity_eval(results, aj, k=3, alpha=0.5).collect()[0]
    # gains: r1: a0 fresh -> 1; r2: a0 seen once -> 0.5, a1 fresh -> 1
    adcg = 1.0 / math.log2(2) + (0.5 + 1.0) / math.log2(3)
    assert abs(r.alpha_dcg - adcg) < 2e-6
    # ERR per aspect (R=1/2): a0: .5/1 + .5*.5/2 = .625; a1: .5/2; a2: 0
    err_ia = (0.625 + 0.25 + 0.0) / 3
    assert r.n_aspects == 3
    assert abs(r.err_ia - err_ia) < 2e-6


def test_lexrank_isolated_sentence_gets_teleport_only(spark):
    sents = spark.createDataFrame(
        [
            (1, 0, "shared words here"),
            (1, 1, "shared words also"),
            (1, 2, "zz qq ww"),
        ],
        "doc_id long, sent_id long, text string",
    )
    rows = lexrank(
        sents, threshold=0.1, teleport=0.15, iterations=4, k=3
    ).collect()
    got = {r.sent_id: r.score for r in rows}
    # s2 shares no terms: degree 0 -> score = 0.15/3 after any iteration
    assert abs(got[2] - 0.05) < 2e-6
    # s0 <-> s1 symmetric: p = .05 + .85 * p_other; fixed point from
    # p0 = 1/3, 4 iterations
    p = 1 / 3
    for _ in range(4):
        p = 0.15 / 3 + 0.85 * p
    assert abs(got[0] - p) < 2e-6 and abs(got[1] - p) < 2e-6
    ranks = {r.sent_id: r.rank for r in rows}
    assert ranks[0] == 1 and ranks[1] == 2 and ranks[2] == 3
