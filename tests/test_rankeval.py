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
