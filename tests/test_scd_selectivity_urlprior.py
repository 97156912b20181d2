"""SCD2 join (ops/scd.py), selectivity audit (index/planstats.py),
URL-type priors (index/urlprior.py)."""

import datetime

from pyspark.sql import functions as F

from tokenkit_spark.index.planstats import selectivity_audit
from tokenkit_spark.index.urlprior import entry_priors, url_class, url_prior_rerank
from tokenkit_spark.ops.scd import scd2_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_scd2_join_picks_valid_version(spark):
    facts = spark.createDataFrame(
        [(1, _ts("2024-01-02 10:00:00")), (1, _ts("2024-01-05 10:00:00"))],
        "user_id long, ts timestamp",
    )
    dim = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-04 00:00:00"), "a"),
            (1, _ts("2024-01-04 00:00:00"), None, "b"),
        ],
        "user_id long, valid_from timestamp, valid_to timestamp,"
        " tier string",
    )
    out = {r.ts: r.tier for r in scd2_join(facts, dim, "user_id").collect()}
    assert out[_ts("2024-01-02 10:00:00")] == "a"
    assert out[_ts("2024-01-05 10:00:00")] == "b"  # open-ended version


def test_scd2_join_boundary_is_half_open(spark):
    facts = spark.createDataFrame(
        [(1, _ts("2024-01-04 00:00:00"))], "user_id long, ts timestamp"
    )
    dim = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-04 00:00:00"), "a"),
            (1, _ts("2024-01-04 00:00:00"), None, "b"),
        ],
        "user_id long, valid_from timestamp, valid_to timestamp,"
        " tier string",
    )
    rows = scd2_join(facts, dim, "user_id").collect()
    assert len(rows) == 1 and rows[0].tier == "b"


# ----------------------------------------------------------- selectivity


def test_selectivity_estimates_vs_actuals(spark):
    # 4 docs; 'a' in all, 'b' in half; independence predicts
    # conj = 4 * 1 * 0.5 = 2, disj = 4 * (1 - 0*0.5) = 4
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "a d")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "a b")], "query_id long, text string")
    r = selectivity_audit(docs, qs).collect()[0]
    assert r.n_terms == 2
    assert abs(r.est_conj - 2.0) < 1e-6 and r.act_conj == 2
    assert abs(r.est_disj - 4.0) < 1e-6 and r.act_disj == 4


def test_selectivity_unindexed_terms_dropped(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    qs = spark.createDataFrame(
        [(0, "a zzz")], "query_id long, text string"
    )
    r = selectivity_audit(docs, qs).collect()[0]
    # only 'a' is indexed; conj over indexed terms = df(a) = 1
    assert r.n_terms == 1 and r.act_conj == 1


# ------------------------------------------------------------ url prior


def test_url_class_taxonomy(spark):
    df = spark.createDataFrame(
        [
            ("https://h.ex/",),
            ("https://h.ex/a/",),
            ("https://h.ex/a/b/",),
            ("https://h.ex/a/b/c.html",),
        ],
        "url string",
    )
    got = [r.c for r in df.select(url_class(F.col("url")).alias("c")).collect()]
    assert got == ["root", "subroot", "path", "file"]


def test_entry_priors_laplace(spark):
    urls = spark.createDataFrame(
        [("https://h.ex/", True), ("https://h.ex/", False),
         ("https://h.ex/a/b/c.html", False)],
        "url string, is_entry boolean",
    )
    out = {r.url_class: r.prior for r in entry_priors(urls).collect()}
    assert abs(out["root"] - (1 + 1) / (2 + 2)) < 1e-9
    assert abs(out["file"] - (0 + 1) / (1 + 2)) < 1e-9


def test_url_prior_promotes_roots(spark):
    # two docs with identical text; the root-classed one must outrank
    # the file-classed one after the prior
    docs = spark.createDataFrame(
        [(0, "apple pie"), (1, "apple pie"), (2, "filler words")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "apple")], "query_id long, text string")
    urls = spark.createDataFrame(
        [(0, "https://h.ex/a/b/c.html", False), (1, "https://h.ex/", True),
         (2, "https://h.ex/a/", False)],
        "doc_id long, url string, is_entry boolean",
    )
    out = sorted(
        url_prior_rerank(docs, qs, urls, k=2).collect(),
        key=lambda r: r.rank,
    )
    assert out[0].doc_id == 1 and out[1].doc_id == 0
