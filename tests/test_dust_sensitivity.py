"""DUST rule mining and BM25 sensitivity on hand-built cases."""

from pyspark.sql import functions as F

from tokenkit_spark.ops.dust import dust_param_rules
from tokenkit_spark.index.feedback import bm25_param_sensitivity


def test_dust_separates_session_from_content_params(spark):
    rows = []
    for i in range(6):
        fp = f"h{i}"
        rows.append((f"https://s.ex/item?page={i}&sid=a", fp))
        rows.append((f"https://s.ex/item?page={i}&sid=b", fp))
    pages = spark.createDataFrame(rows, "url string, fingerprint string")
    out = {r.param: r for r in dust_param_rules(pages).collect()}
    # sid: 6 groups (one per page), all uniform
    assert out["sid"].n_groups == 6 and out["sid"].precision == 1.0
    assert out["sid"].n_urls_covered == 6
    # page: 2 groups (sid=a, sid=b), each mixes 6 fingerprints
    assert out["page"].n_groups == 2 and out["page"].precision == 0.0


def test_dust_mixed_evidence_precision(spark):
    pages = spark.createDataFrame(
        [
            ("https://s.ex/a?x=1", "h1"),
            ("https://s.ex/a?x=2", "h1"),   # uniform group for x
            ("https://s.ex/b?x=1", "h2"),
            ("https://s.ex/b?x=2", "h3"),   # conflicting group for x
        ],
        "url string, fingerprint string",
    )
    out = {r.param: r for r in dust_param_rules(pages).collect()}
    assert out["x"].n_groups == 2 and out["x"].n_uniform == 1
    assert abs(out["x"].precision - 0.5) < 1e-9


def test_bm25_sensitivity_b_moves_more_than_k1(spark):
    # length-skewed corpus: b should reorder more than k1 does
    docs = spark.createDataFrame(
        [(i, ("common " * (2 + (i % 9) * 6) + f"rare{i}").strip())
         for i in range(30)],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "common rare3")], "query_id long, text string"
    )
    out = bm25_param_sensitivity(
        docs, qs, grid=[(1.2, 0.0), (2.0, 0.75)], depth=30, k_overlap=10
    ).collect()
    rows = {(r.k1, r.b): r for r in out}
    assert set(rows) == {(1.2, 0.0), (2.0, 0.75)}
    # b=0 run must deviate at least as much as the k1 tweak
    assert rows[(1.2, 0.0)].mean_tau <= rows[(2.0, 0.75)].mean_tau
    for r in out:
        assert -1.0 <= r.mean_tau <= 1.0 and 0.0 <= r.mean_overlap <= 1.0
