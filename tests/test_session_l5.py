"""Session-L batch 5: CommonTermsQuery, static-rank cutoff,
Kaplan-Meier, pagination families, query-flow MRR, capacity forecast."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------- common terms
def test_common_terms_gates_on_rare_only(spark):
    from tokenkit_spark.index.commonterms import common_terms_search

    # 'the' in 9/10 docs (common at 0.3); 'zebra' rare in one
    docs = spark.createDataFrame(
        [(i, "the filler text") for i in range(9)]
        + [(9, "zebra escaped")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "the zebra")], "query_id long, text string"
    )
    out = common_terms_search(docs, q, cutoff=0.3).collect()
    # only the zebra doc satisfies the rare conjunction
    assert len(out) == 1 and out[0].doc_id == 9
    assert out[0].n_rare_hit == 1


def test_common_terms_all_common_degrades_to_disjunction(spark):
    from tokenkit_spark.index.commonterms import common_terms_search

    docs = spark.createDataFrame(
        [(i, "the and filler") for i in range(5)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "the and")], "query_id long, text string"
    )
    out = common_terms_search(docs, q, cutoff=0.3).collect()
    # n_rare = 0 -> every matching doc is returned
    assert len(out) == 5
    assert all(r.n_rare_hit == 0 for r in out)


# ------------------------------------------------------ static rank cutoff
def test_static_rank_full_tier_exact_and_small_tier_caps(spark):
    from tokenkit_spark.index.staticrank import static_rank_cutoff

    docs = spark.createDataFrame(
        [(i, f"term{i % 3} shared") for i in range(20)],
        "doc_id long, text string",
    )
    # doc 0 gets all the inlinks -> static rank 1
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 10)], "src long, dst long"
    )
    q = spark.createDataFrame(
        [(0, "shared")], "query_id long, text string"
    )
    out = {
        r.keep_frac: r
        for r in static_rank_cutoff(
            docs, q, edges, keep_fracs=(0.1, 1.0), k=5
        ).collect()
    }
    assert out[1.0].topk_overlap == 5 and out[1.0].top1_match == 1
    assert out[0.1].n_kept_docs == 2
    # the truncated tier can return at most n_kept_docs
    assert out[0.1].topk_overlap <= 2


# ------------------------------------------------------------ kaplan-meier
def test_kaplan_meier_no_censoring_matches_empirical(spark):
    from tokenkit_spark.ops.survival import kaplan_meier

    # 4 users with lifetimes 1,1,2,3 days; horizon far beyond
    rows = []
    spans = {1: 0, 2: 0, 3: 1, 4: 2}
    for u, extra in spans.items():
        rows.append((dt.datetime(2024, 1, 1), u, "a", 1.0))
        rows.append((dt.datetime(2024, 1, 1 + extra), u, "a", 1.0))
    rows.append((dt.datetime(2024, 1, 25), 99, "a", 1.0))  # horizon
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.t_days: r for r in kaplan_meier(ev, 3).collect()}
    # t=1: 5 at risk, users 1+2 die, user 99 censored -> S = 3/5
    assert out[1].n_risk == 5 and out[1].n_events == 2
    assert out[1].n_censored == 1
    assert out[1].survival == pytest.approx(0.6)
    # t=2: the censored user leaves the risk set -> 2 at risk, 1 dies
    assert out[2].n_risk == 2
    assert out[2].survival == pytest.approx(0.3)
    # t=3: last subject dies -> the curve hits exactly 0
    assert out[3].n_risk == 1 and out[3].survival == 0.0


def test_kaplan_meier_all_censored_flat(spark):
    from tokenkit_spark.ops.survival import kaplan_meier

    rows = [
        (dt.datetime(2024, 1, 10), u, "a", 1.0) for u in range(5)
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = kaplan_meier(ev, 3).collect()
    # everyone active at the horizon -> no deaths, survival stays 1
    assert all(r.survival == 1.0 and r.n_events == 0 for r in out)


# -------------------------------------------------------------- pagination
def test_pagination_families_grouping(spark):
    from tokenkit_spark.ops.traps import pagination_families

    pages = spark.createDataFrame(
        [
            ("h", "https://h.ex/list?page=1"),
            ("h", "https://h.ex/list?page=2"),
            ("h", "https://h.ex/list?page=9"),
            ("h", "https://h.ex/blog/page/3/"),
            ("h", "https://h.ex/about"),
        ],
        "host string, url string",
    )
    r = pagination_families(pages).collect()[0]
    assert r.n_urls == 5 and r.n_paginated == 4
    # families: list?, /blog/, /about
    assert r.n_families == 3
    assert r.max_family_size == 3
    assert r.max_page_no == 9
    assert r.frac_paginated == pytest.approx(0.8)


# --------------------------------------------------------------- qflow mrr
def test_suggestion_mrr_deterministic_log(spark):
    from tokenkit_spark.ops.queryflow import suggestion_mrr

    rows = []
    # session 1..3: a -> b ; session 4: a -> c
    for s in (1, 2, 3):
        rows += [(s, 1, "a"), (s, 2, "b")]
    rows += [(4, 1, "a"), (4, 2, "c")]
    qlog = spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )
    out = suggestion_mrr(qlog).collect()
    r = {x.src: x for x in out}["a"]
    assert r.n_transitions == 4 and r.n_candidates == 2
    # b ranked 1 (3 transitions), c ranked 2 (1 transition)
    assert r.mrr == pytest.approx((3 * 1.0 + 0.5) / 4)
    assert r.hit_at1 == pytest.approx(0.75)


# -------------------------------------------------------- capacity forecast
def test_capacity_forecast_shapes_and_monotonicity(spark):
    from tokenkit_spark.index.capacity import index_capacity_forecast

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 13 + j) % 40}" for j in range(12)))
         for i in range(60)],
        "doc_id long, text string",
    )
    out = sorted(
        index_capacity_forecast(docs, multipliers=(1, 10, 100)).collect(),
        key=lambda r: r.mult,
    )
    t1 = out[0]
    assert t1.tokens_proj == 720  # 60 docs x 12 tokens
    assert t1.postings_proj > 0
    # postings scale linearly, vocab sublinearly (beta < 1)
    assert out[1].postings_proj == 10 * t1.postings_proj
    assert out[1].vocab_proj < 10 * t1.vocab_proj
    # mb projection consistent with its own factors (t1's rounded mb
    # is too small to compare ratios against)
    assert out[2].index_mb_proj == pytest.approx(
        out[2].postings_proj * out[2].bytes_per_posting / 2**20,
        rel=1e-2,
    )
