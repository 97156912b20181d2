"""Session-L batch 11: heading outline, structured data, title dedup,
cube rollup, entity salience, Luhn sentences."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------- html audits
def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, html string")


def test_heading_outline_counts(spark):
    from tokenkit_spark.ops.htmlmeta import heading_outline

    rows = [
        ("h", "<h1>a</h1><h2>b</h2><h2>c</h2>"),
        ("h", "<h2>only</h2>"),            # no h1
        ("h", "<h1>a</h1><h1>b</h1>"),     # multi h1
        ("h", "no headings at all"),
    ]
    r = heading_outline(_pages(spark, rows)).collect()[0]
    assert r.n_pages == 4 and r.n_headings == 6
    assert r.pages_no_h1 == 2  # the h2-only page and the bare page
    assert r.pages_multi_h1 == 1
    # levels: 1,2,2,2,1,1 -> mean 1.5
    assert r.mean_level == pytest.approx(1.5)


def test_structured_data_coverage(spark):
    from tokenkit_spark.ops.htmlmeta import structured_data_audit

    rows = [
        ("h", '<script type="application/ld+json">{}</script>'),
        ("h", '<meta property="og:title" content="t">'),
        ("h", '<meta name="twitter:card" content="s">'),
        ("h", "<p>nothing</p>"),
    ]
    r = structured_data_audit(_pages(spark, rows)).collect()[0]
    assert r.pages_jsonld == 1 and r.pages_og == 1
    assert r.pages_twitter == 1
    assert r.frac_any_structured == pytest.approx(0.75)


def test_title_dedup(spark):
    from tokenkit_spark.ops.htmlmeta import title_dedup_audit

    rows = [
        ("h", "<title>Home</title>"),
        ("h", "<title>Home</title>"),
        ("h", "<title>About</title>"),
        ("h", "<head></head>"),  # untitled
    ]
    r = title_dedup_audit(_pages(spark, rows)).collect()[0]
    assert r.n_pages == 4 and r.pages_untitled == 1
    assert r.n_distinct_titles == 2 and r.max_title_family == 2
    # 3 titled pages, 2 distinct -> dup rate 1/3
    assert r.dup_title_rate == pytest.approx(1 / 3, abs=1e-5)


# -------------------------------------------------------------- cube rollup
def test_cube_rollup_grand_total_and_marginals(spark):
    from tokenkit_spark.ops.events import cube_rollup

    ev = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), 1, "a", 10.0),  # Monday
            (dt.datetime(2024, 1, 2), 1, "a", 20.0),  # Tuesday
            (dt.datetime(2024, 1, 1), 1, "b", 5.0),
        ],
        "ts timestamp, user_id long, event_type string, value double",
    )
    out = cube_rollup(ev).collect()
    grand = [r for r in out if r.gid == 3][0]
    assert grand.n_events == 3 and grand.total_value == 35.0
    type_marg = {
        r.event_type: r for r in out if r.gid == 1
    }  # weekday rolled up
    assert type_marg["a"].total_value == 30.0
    day_marg = {r.weekday_iso: r for r in out if r.gid == 2}
    assert day_marg[1].n_events == 2  # two Monday events


# ---------------------------------------------------------- entity salience
def test_entity_salience_position_and_frequency(spark):
    from tokenkit_spark.ops.textstats import entity_salience

    docs = spark.createDataFrame(
        [
            (0, "s", "intro text Alice and Alice again then Zed"),
            (1, "s", "more words here Alice speaks"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.entity: r for r in entity_salience(docs, k=5).collect()}
    assert out["alice"].total_tf == 3 and out["alice"].n_docs == 2
    # alice mentioned earlier and more often -> outranks zed
    assert out["alice"].rank < out["zed"].rank


def test_entity_salience_skips_sentence_initial(spark):
    from tokenkit_spark.ops.textstats import entity_salience

    docs = spark.createDataFrame(
        [(0, "s", "Capital start but no other entities here")],
        "doc_id long, source string, text string",
    )
    assert entity_salience(docs).collect() == []


# ------------------------------------------------------------------- luhn
def test_luhn_picks_dense_significant_sentence(spark):
    from tokenkit_spark.ops.textstats import luhn_sentences

    # 'engine' and 'query' are significant (tf >= 2, not stopwords);
    # sentence 1 packs them densely
    text = (
        "filler words without payload here. "
        "query engine query engine. "
        "engine at start then query far apart somewhere"
    )
    docs = spark.createDataFrame(
        [(0, text)], "doc_id long, text string"
    )
    r = luhn_sentences(docs).collect()[0]
    assert r.sent_idx == 1
    # 4 significant tokens spanning 4 positions -> 16/4
    assert r.score == pytest.approx(4.0)
