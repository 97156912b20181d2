"""ES aggregation-family operators (ops/aggs.py) + hybrid retrieval
(index/hybrid.py): semantics pinned on tiny hand-computed frames.

Reference contracts: the ES agg API (rare_terms, adjacency_matrix,
composite, top_metrics, matrix_stats, string_stats, boxplot, range,
diversified_sampler, weighted_avg, serial_diff, bucket_selector/
bucket_sort) and the ES 8.x rrf retriever / Lucene BlendedTermQuery
(cross_fields)."""

import math

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.config import AnalyzerConfig
from tokenkit_spark.index import hybrid
from tokenkit_spark.ops import aggs

WS = AnalyzerConfig(strategy="whitespace", lowercase=True)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # event_id, type, value, weight
        (1, "a", 10.0, 2.0),
        (2, "a", 20.0, 1.0),
        (3, "a", 30.0, 1.0),
        (4, "b", 5.0, 3.0),
        (5, "b", 15.0, 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, etype string, value double, w double"
    )


def test_rare_terms(spark):
    rows = [(1, "x"), (2, "x"), (3, "x"), (1, "y"), (2, "y"), (1, "z")]
    toks = spark.createDataFrame(rows, "doc_id long, term string")
    got = aggs.rare_terms(toks, max_doc_count=2).collect()
    assert [(r.term, r.df) for r in got] == [("z", 1), ("y", 2)]


def test_adjacency_matrix_keys_and_counts(spark):
    rows = [(True, True, False), (True, False, False), (False, False, False)]
    flags = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    got = {r.key: r.doc_count for r in aggs.adjacency_matrix(flags, ["b", "a", "c"]).collect()}
    # names sorted; zero-count intersections dropped (ES contract)
    assert got == {"a": 2, "b": 1, "a&b": 1}


def test_composite_after_key_is_exclusive_lexicographic(spark):
    rows = [("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 1)]
    df = spark.createDataFrame(rows, "k string, v int")
    out = aggs.composite_agg(
        df,
        [("k", F.col("k")), ("v", F.col("v"))],
        size=10,
        after=("b", 1),
    ).collect()
    assert [(r.k, r.v) for r in out] == [("b", 2), ("c", 1)]


def test_top_metrics_picks_metric_at_sort_extreme(spark):
    rows = [(1, "a", 10, 1.0), (2, "a", 20, 2.0), (3, "a", 20, 3.0), (4, "b", 5, 9.0)]
    df = spark.createDataFrame(rows, "event_id long, etype string, s long, m double")
    got = {
        r.etype: (r.top_sort, r.top_metric)
        for r in aggs.top_metrics(df, "etype", "s", "m", "event_id").collect()
    }
    # tie on s=20 broken by the larger event_id
    assert got == {"a": (20, 3.0), "b": (5, 9.0)}


def test_matrix_stats_matches_closed_form(spark, events):
    got = {
        r.etype: r
        for r in aggs.matrix_stats(events, "etype", "value", "w").collect()
    }
    a = got["a"]
    assert a.n == 3 and a.mean_x == 20.0
    # population variance of (10,20,30) = 200/3
    assert a.var_x == round(200 / 3, 4)
    # cov_pop((10,20,30),(2,1,1)) = mean(xy) - mx*my
    assert a.covariance == round((20 + 20 + 30) / 3 - 20.0 * (4 / 3), 4)


def test_string_stats_entropy(spark):
    docs = spark.createDataFrame([(1, "en", "aab"), (2, "en", "b")], "doc_id long, lang string, text string")
    r = aggs.string_stats(docs, "lang").collect()[0]
    assert (r["count"], r.min_length, r.max_length) == (2, 1, 3)
    # chars: a,a,b,b -> p = .5/.5 -> H = 1 bit
    assert r.entropy == 1.0


def test_boxplot_interpolated_quartiles(spark, events):
    got = {r.etype: r for r in aggs.boxplot(events, "etype", "value").collect()}
    a = got["a"]
    assert (a.min_v, a.q1, a.q2, a.q3, a.max_v) == (10.0, 15.0, 20.0, 25.0, 30.0)


def test_range_agg_overlapping_bounds(spark, events):
    got = {
        (r.etype, r.range_key): r.doc_count
        for r in aggs.range_agg(
            events, "value", [(None, 15), (10, None)], group_col="etype"
        ).collect()
    }
    assert got[("a", "*-15")] == 1 and got[("a", "10-*")] == 3
    assert got[("b", "*-15")] == 1 and got[("b", "10-*")] == 1


def test_diversified_sampler_caps_per_value(spark):
    rows = [(i, "s" + str(i % 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = aggs.diversified_sampler(df, "src", "doc_id", 2, 3).collect()
    assert [r.doc_id for r in out] == [0, 1, 2]
    out2 = aggs.diversified_sampler(df, "src", "doc_id", 1, 3).collect()
    assert [r.doc_id for r in out2] == [0, 1]  # only 2 sources survive the cap


def test_weighted_avg(spark, events):
    got = {r.etype: r.weighted_avg for r in aggs.weighted_avg(events, "etype", "value", "w").collect()}
    assert got["a"] == round((10 * 2 + 20 + 30) / 4.0, 4)
    assert got["b"] == round((5 * 3 + 15) / 4.0, 4)


def test_serial_diff_and_bucket_selector(spark):
    buckets = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 15.0)], "b int, v double"
    )
    d = aggs.serial_diff(buckets, "b", "v", lag=1).collect()
    assert [(r.b, r.diff_1) for r in d] == [(2, 20.0), (3, -15.0)]
    s = aggs.bucket_selector_sort(buckets, "v", 12.0, size=1).collect()
    assert [(r.b, r.v) for r in s] == [(2, 30.0)]


def test_percentile_ranks_exact_definition(spark, events):
    got = {
        (r[0], r.threshold): r.pct_rank
        for r in aggs.percentile_ranks(events, "etype", "value", [10.0, 25.0]).collect()
    }
    # a: values 10,20,30 -> <=10 is 1/3, <=25 is 2/3
    assert got[("a", 10.0)] == round(100.0 / 3, 6)
    assert got[("a", 25.0)] == round(200.0 / 3, 6)
    # b: values 5,15 -> <=10 is 1/2, <=25 is 2/2
    assert got[("b", 10.0)] == 50.0
    assert got[("b", 25.0)] == 100.0


def test_median_abs_deviation_hand_computed(spark, events):
    got = {r.etype: r.mad for r in aggs.median_abs_deviation(events, "etype", "value").collect()}
    # a: median 20, |devs| = [10, 0, 10] -> mad 10; b: median 10, devs [5, 5] -> 5
    assert got == {"a": 10.0, "b": 5.0}


def test_cumulative_sum_buckets_running_total(spark):
    rows = [
        ("2024-01-01 05:00:00", 1.0),
        ("2024-01-01 09:00:00", 2.0),
        ("2024-01-03 01:00:00", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = aggs.cumulative_sum_buckets(df, "ts", "value", interval="day").collect()
    assert [(str(r.bucket)[:10], r.bucket_sum, r.cumulative) for r in out] == [
        ("2024-01-01", 3.0, 3.0),
        ("2024-01-03", 4.0, 7.0),
    ]


def test_auto_date_histogram_picks_finest_fitting_rung(spark):
    # 5-minute span, target 10 -> minute rung (5 buckets)
    rows = [(f"2024-01-01 00:0{m}:30",) for m in range(5)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    out = aggs.auto_date_histogram(df, "ts", target_buckets=10).collect()
    assert all(r.interval == "minute" for r in out)
    assert len(out) == 5 and all(r.doc_count == 1 for r in out)
    # 2-year span -> nothing finer fits; year rung
    rows = [("2022-01-01 00:00:00",), ("2024-06-01 00:00:00",)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    out = aggs.auto_date_histogram(df, "ts", target_buckets=10).collect()
    assert all(r.interval == "year" for r in out) and len(out) == 2


def test_t_test_welch_closed_form(spark, events):
    r = aggs.t_test_welch(events, "etype", "value", "a", "b").collect()[0]
    # a: n=3 mean=20 var=100; b: n=2 mean=10 var=50
    se = 100.0 / 3 + 50.0 / 2
    t = (20.0 - 10.0) / math.sqrt(se)
    dof = se * se / ((100.0 / 3) ** 2 / 2 + 25.0**2 / 1)
    assert (r.n_a, r.mean_a, r.n_b, r.mean_b) == (3, 20.0, 2, 10.0)
    assert r.t_stat == round(t, 6) and r.dof == round(dof, 4)


def test_filters_agg_overlap_and_other_bucket(spark, events):
    got = {
        r.bucket: r.doc_count
        for r in aggs.filters_agg(
            events, {"big": "value >= 15", "typea": "etype = 'a'"}
        ).collect()
    }
    # overlapping buckets count independently; _other_ = rows matching none
    assert got == {"big": 3, "typea": 3, "_other_": 1}


def test_date_range_agg_bounds_and_open_ends(spark):
    rows = [("2024-01-05 12:00:00",), ("2024-01-10 00:00:00",), ("2024-01-15 01:00:00",)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        r.range_key: r.doc_count
        for r in aggs.date_range_agg(
            df, "ts", [(None, "2024-01-10"), ("2024-01-10", "2024-01-16")]
        ).collect()
    }
    # from inclusive, to exclusive: the 01-10T00:00 row is in the SECOND bucket
    assert got == {"*-2024-01-10": 1, "2024-01-10-2024-01-16": 2}


def test_bucket_script_and_stats_bucket(spark):
    buckets = spark.createDataFrame(
        [(1, 2.0, 10.0), (2, 3.0, 10.0)], "b int, num double, den double"
    )
    out = aggs.bucket_script(buckets, "num / den", "ratio").collect()
    assert sorted((r.b, r.ratio) for r in out) == [(1, 0.2), (2, 0.3)]
    st = aggs.stats_bucket(buckets, "num").collect()[0]
    assert (st["count"], st["min"], st["max"], st["avg"], st["sum"]) == (
        2, 2.0, 3.0, 2.5, 5.0,
    )


def test_normalize_buckets_methods(spark):
    buckets = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 70.0)], "b int, v double"
    )
    def vals(method):
        return {
            r.b: r.normalized
            for r in aggs.normalize_buckets(buckets, "v", method=method).collect()
        }
    assert vals("percent_of_sum") == {1: 0.1, 2: 0.2, 3: 0.7}
    assert vals("rescale_0_1") == {1: 0.0, 2: round(10 / 60, 6), 3: 1.0}
    # mean: (v - avg) / (max - min), avg = 100/3
    import math as _m
    want = {b: round((v - 100 / 3) / 60.0, 6) for b, v in [(1, 10.0), (2, 20.0), (3, 70.0)]}
    assert vals("mean") == want
    sd = _m.sqrt(((10 - 100 / 3) ** 2 + (20 - 100 / 3) ** 2 + (70 - 100 / 3) ** 2) / 3)
    want = {b: round((v - 100 / 3) / sd, 6) for b, v in [(1, 10.0), (2, 20.0), (3, 70.0)]}
    assert vals("z-score") == want
    with pytest.raises(ValueError, match="unknown method"):
        aggs.normalize_buckets(buckets, "v", method="bogus")


# --- hybrid retrieval ------------------------------------------------------

def test_rrf_fuse_formula_and_missing_doc(spark):
    lex = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 200)], "query_id long, rank long, doc_id long"
    )
    vec = spark.createDataFrame(
        [(0, 1, 200), (0, 2, 300)], "query_id long, rank long, doc_id long"
    )
    got = {r.doc_id: r for r in hybrid.rrf_fuse([lex, vec], k_const=60, k=10).collect()}
    # doc 200: rank2 lex + rank1 vec
    assert got[200].rrf_score == round(1 / 62 + 1 / 61, 6)
    assert got[200].n_retrievers == 2 and got[200].rank == 1
    # docs present in one list only still score
    assert got[100].rrf_score == round(1 / 61, 6) and got[100].n_retrievers == 1


def test_cosine_ranking_orders_by_similarity(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = hybrid.cosine_ranking(emb, [1.0, 0.0], window=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]


def test_cross_fields_term_centric_beats_best_fields_split(spark):
    # query terms split across fields: doc 1 has 'alpha' in title and
    # 'beta' in body; doc 2 has both in body only. cross_fields must give
    # doc 1 credit for both terms.
    docs = spark.createDataFrame(
        [
            (1, "alpha intro", "beta beta content here"),
            (2, "other title", "alpha beta content here"),
            (3, "noise", "filler filler filler filler"),
        ],
        "doc_id long, title string, body string",
    )
    q = spark.createDataFrame([(0, "alpha beta")], "query_id long, text string")
    out = hybrid.cross_fields(docs, q, ["title", "body"], WS, k=3).collect()
    by_doc = {r.doc_id: r for r in out}
    assert 1 in by_doc and 2 in by_doc
    # both docs match both terms; each term scored in its best field
    assert by_doc[1].score > 0 and by_doc[2].score > 0
    # blended df: 'alpha' df = max(title_df=1, body_df=1) = 1, so idf equal
    # across docs; sanity: doc 3 matches nothing
    assert 3 not in by_doc


def test_cross_fields_blended_df_uses_max_across_fields(spark):
    # 'common' is in every body (df=3) but one title (df=1): blended df
    # must be 3, making it low-idf everywhere.
    docs = spark.createDataFrame(
        [
            (1, "common x", "common a b"),
            (2, "y z", "common c d"),
            (3, "p q", "common e f"),
        ],
        "doc_id long, title string, body string",
    )
    q = spark.createDataFrame([(0, "common")], "query_id long, text string")
    out = hybrid.cross_fields(docs, q, ["title", "body"], WS, k=3).collect()
    idf = math.log(1 + (3 - 3 + 0.5) / (3 + 0.5))
    # every score must be <= idf * (k1+1) — i.e. computed with df=3, not df=1
    assert all(r.score <= idf * 2.2 + 1e-9 for r in out)
