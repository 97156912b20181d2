"""ES _rank_eval metric math on hand-computed cases."""

import math

from tokenkit_spark.index.rankeval import rank_eval


def test_rank_eval_known_values(spark):
    # query 0: results r1=docA(grade 2), r2=docB(0/unjudged), r3=docC(1)
    results = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12)],
        "query_id long, rank long, doc_id long",
    )
    judgments = spark.createDataFrame(
        [(0, 10, 2), (0, 12, 1), (0, 99, 3)],  # doc 99 relevant but unranked
        "query_id long, doc_id long, grade long",
    )
    r = rank_eval(results, judgments, k=3).collect()[0]
    assert abs(r.precision_k - 2 / 3) < 2e-6
    assert abs(r.recall_k - 2 / 3) < 2e-6  # 2 of 3 relevant docs retrieved
    assert abs(r.mrr - 1.0) < 2e-6
    dcg = (2**2 - 1) / math.log2(2) + 0 + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert abs(r.dcg - round(dcg, 6)) < 2e-6
    assert abs(r.ndcg - round(dcg / idcg, 6)) < 1e-6


def test_rank_eval_no_relevant(spark):
    results = spark.createDataFrame(
        [(1, 1, 20)], "query_id long, rank long, doc_id long"
    )
    judgments = spark.createDataFrame(
        [], "query_id long, doc_id long, grade long"
    )
    r = rank_eval(results, judgments, k=10).collect()[0]
    assert r.precision_k == 0.0 and r.recall_k == 0.0
    assert r.mrr == 0.0 and r.ndcg == 0.0


def test_err_rbp_ap_known_values(spark):
    """Hand-computed ERR/RBP/AP (Chapelle CIKM 2009 eq. 4; Moffat &
    Zobel TOIS 2008 eq. 2; trec_eval AP@k) on a 3-deep ranking."""
    from tokenkit_spark.index.rankeval import err_rbp_ap

    results = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12)],
        "query_id long, rank long, doc_id long",
    )
    judgments = spark.createDataFrame(
        [(0, 10, 2), (0, 12, 1), (0, 99, 3)],
        "query_id long, doc_id long, grade long",
    )
    r = err_rbp_ap(results, judgments, k=3, max_grade=3, p=0.8).collect()[0]
    r1, r2, r3 = (2**2 - 1) / 8, 0.0, (2**1 - 1) / 8
    err = r1 / 1 + (1 - r1) * r2 / 2 + (1 - r1) * (1 - r2) * r3 / 3
    assert abs(r.err_k - err) < 2e-6
    rbp = 0.2 * (1 * 0.8**0 + 0 * 0.8**1 + 1 * 0.8**2)
    assert abs(r.rbp_k - rbp) < 2e-6
    ap = (1 / 1 + 2 / 3) / 3  # P@1*rel1 + P@3*rel3, 3 relevant judged
    assert abs(r.ap_k - ap) < 2e-6


def test_err_perfect_grade_zeroes_tail(spark):
    """A max-grade doc at rank 1 stops the cascade: ERR == 1*R_1."""
    from tokenkit_spark.index.rankeval import err_rbp_ap

    results = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11)], "query_id long, rank long, doc_id long"
    )
    judgments = spark.createDataFrame(
        [(0, 10, 3), (0, 11, 3)], "query_id long, doc_id long, grade long"
    )
    r = err_rbp_ap(results, judgments, k=2, max_grade=3).collect()[0]
    # R_1 = 7/8; tail contributes (1-7/8)*(7/8)/2
    assert abs(r.err_k - (7 / 8 + (1 / 8) * (7 / 8) / 2)) < 2e-6
