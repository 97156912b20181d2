"""Moore-Lewis selection, Count-Min audit, and rank correlation on
hand-computed cases."""

import math

from tokenkit_spark.ops.dsir import moore_lewis_scores
from tokenkit_spark.ops.heavyhitters import count_min_audit
from tokenkit_spark.index.rankeval import rank_correlation

from pyspark.sql import functions as F


def test_moore_lewis_prefers_in_domain_like(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha", "en"),
            (2, "alpha beta gamma", "xx"),   # looks in-domain
            (3, "zeta zeta zeta", "xx"),     # does not
        ],
        "doc_id long, text string, lang string",
    )
    rows = moore_lewis_scores(
        docs, F.col("lang") == "en", alpha=0.5, k=10
    ).collect()
    by_rank = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert by_rank == [2, 3]
    s = {r.doc_id: r.score for r in rows}
    # hand-check doc 3: all tokens 'zeta', c_in=0 c_gen=3, V=4,
    # n_in=3 n_gen=6
    lr_zeta = math.log((3 + 0.5) / (6 + 0.5 * 4)) - math.log(
        (0 + 0.5) / (3 + 0.5 * 4)
    )
    assert abs(s[3] - lr_zeta) < 2e-6
    assert s[2] < s[3]


def test_count_min_one_sided_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i % 7} t{i % 5} filler") for i in range(40)],
        "doc_id long, text string",
    )
    rows = count_min_audit(docs, width=1024).collect()
    assert rows, "audit must emit strata"
    n_total = 40 * 3
    for r in rows:
        assert r.mean_over >= 0 and r.max_over >= 0  # CM never undercounts
        assert abs(r.bound - math.e / 1024 * n_total) < 1e-6
        # width 1024 >> 13 distinct terms: no collisions -> exact
        assert r.frac_exact == 1.0 and r.max_over == 0


def test_rank_correlation_known_values(spark):
    # run A ranks docs 1..4; run B reverses them; doc 9 only in A.
    a = spark.createDataFrame(
        [(0, r, d) for r, d in enumerate([1, 2, 3, 4, 9], start=1)],
        "query_id long, rank long, doc_id long",
    )
    b = spark.createDataFrame(
        [(0, r, d) for r, d in enumerate([4, 3, 2, 1], start=1)],
        "query_id long, rank long, doc_id long",
    )
    r = rank_correlation(a, b).collect()[0]
    assert r.n_common == 4
    assert abs(r.kendall_tau - (-1.0)) < 1e-9   # perfect reversal
    assert abs(r.spearman_rho - (-1.0)) < 1e-9


def test_rank_correlation_identity_and_degenerate(spark):
    a = spark.createDataFrame(
        [(0, 1, 5), (0, 2, 6), (1, 1, 7)],
        "query_id long, rank long, doc_id long",
    )
    out = {r.query_id: r for r in rank_correlation(a, a).collect()}
    assert out[0].kendall_tau == 1.0 and out[0].spearman_rho == 1.0
    assert out[1].kendall_tau is None  # n_common < 2 -> undefined
