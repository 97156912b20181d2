"""Sitemap parsing, anchor-text aggregation, frontier scheduling."""

import datetime

from pyspark.sql import functions as F

from tokenkit_spark.ops import anchortext, frontier
from tokenkit_spark.sources import sitemaps


URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.com/x?p=1&amp;q=2</loc>"
    "<lastmod>2026-03-04T10:00:00+00:00</lastmod>"
    "<changefreq>weekly</changefreq><priority>0.8</priority></url>"
    "<url>\n  <loc> https://a.com/bare </loc>\n</url>"
    "<url><priority>0.1</priority></url>"  # no loc -> dropped
    "</urlset>"
)
INDEX = (
    '<?xml version="1.0"?>'
    "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
    "<lastmod>2026-01-02</lastmod></sitemap>"
    "<sitemap><loc>https://a.com/s2.xml</loc></sitemap></sitemapindex>"
)


def test_parse_urlset_and_index(spark):
    df = spark.createDataFrame(
        [("a.com", URLSET), ("idx.com", INDEX)], "host string, body string"
    )
    rows = {
        (r.host, r.loc): r for r in sitemaps.parse_sitemaps(df).collect()
    }
    assert len(rows) == 4  # loc-less entry dropped
    full = rows[("a.com", "https://a.com/x?p=1&q=2")]  # &amp; decoded
    assert full.kind == "url"
    assert full.lastmod == datetime.date(2026, 3, 4)
    assert full.changefreq == "weekly"
    assert abs(full.priority - 0.8) < 1e-9
    bare = rows[("a.com", "https://a.com/bare")]  # whitespace trimmed
    assert bare.lastmod is None and bare.changefreq is None
    assert abs(bare.priority - 0.5) < 1e-9  # protocol default
    s2 = rows[("idx.com", "https://a.com/s2.xml")]
    assert s2.kind == "sitemap" and s2.lastmod is None


def test_fresh_urls_recrawl_filter(spark):
    entries = sitemaps.parse_sitemaps(
        spark.createDataFrame([("a.com", URLSET), ("idx.com", INDEX)],
                              "host string, body string")
    )
    last = spark.createDataFrame(
        [("a.com", datetime.date(2026, 2, 1))], "host string, crawled_at date"
    )
    fresh = sitemaps.fresh_urls(entries, last)
    locs = {r.loc for r in fresh.collect()}
    # lastmod 2026-03-04 > crawl, lastmod-less entry kept, index rows excluded
    assert locs == {"https://a.com/x?p=1&q=2", "https://a.com/bare"}
    # a host never crawled keeps everything
    fresh_all = sitemaps.fresh_urls(
        entries, spark.createDataFrame([], "host string, crawled_at date")
    )
    assert fresh_all.count() == 2


def test_anchor_counts_tf_vs_links(spark):
    edges = spark.createDataFrame(
        [
            (1, 10, "home page"),
            (2, 10, "home home"),   # repeated inside ONE anchor
            (3, 10, "best docs"),
            (1, 20, "click"),
        ],
        "src int, dst int, anchor string",
    )
    counts = {
        (r.dst, r.term): (r.tf, r.n_links)
        for r in anchortext.anchor_term_counts(edges).collect()
    }
    assert counts[(10, "home")] == (3, 2)  # tf counts both, n_links dedups
    assert counts[(10, "page")] == (1, 1)
    assert counts[(20, "click")] == (1, 1)


def test_anchor_field_rank_order(spark):
    edges = spark.createDataFrame(
        [(i, 1, "alpha beta") for i in range(3)] + [(9, 1, "beta")],
        "src int, dst int, anchor string",
    )
    field = anchortext.anchor_field(edges, k=2).collect()[0]
    assert field.anchor_text == "beta alpha"  # beta: 4 links > alpha: 3
    assert field.n_anchor_terms == 2


def test_frontier_waves_and_budget(spark):
    urls = spark.createDataFrame(
        [("h1", f"/a{i}", i) for i in range(5)]
        + [("h2", "/z", 100)],
        "host string, url string, priority int",
    )
    sched = frontier.schedule_frontier(urls).collect()
    by_url = {r.url: r for r in sched}
    # wave 0 = each host's best URL; h2's lone high-priority URL leads
    assert by_url["/z"].wave == 0 and by_url["/z"].fetch_order == 0
    assert by_url["/a4"].wave == 0 and by_url["/a4"].fetch_order == 1
    # h1's remaining urls occupy one wave each (politeness)
    assert by_url["/a3"].wave == 1 and by_url["/a0"].wave == 4
    # fetch_order is a dense 0..n-1 permutation
    assert sorted(r.fetch_order for r in sched) == list(range(6))

    capped = frontier.frontier_budget(urls, per_host_cap=2)
    kept = {r.url for r in capped.collect()}
    assert kept == {"/a4", "/a3", "/z"}


def test_frontier_matches_single_window_reference(spark):
    # distributed (offset + in-wave rank) sequence == the naive global
    # window on a small frontier
    urls = spark.createDataFrame(
        [(f"h{i % 7}", f"/u{i:03d}", (i * 13) % 5) for i in range(60)],
        "host string, url string, priority int",
    )
    got = {
        r.url: r.fetch_order for r in frontier.schedule_frontier(urls).collect()
    }
    from pyspark.sql import Window

    per_host = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url").asc()
    )
    ref = (
        urls.withColumn("wave", F.row_number().over(per_host) - 1)
        .withColumn(
            "fo",
            F.row_number().over(
                Window.orderBy(
                    F.col("wave").asc(), F.col("priority").desc(), F.col("url").asc()
                )
            )
            - 1,
        )
        .collect()
    )
    assert got == {r.url: r.fo for r in ref}


def test_paragraph_dedup_first_occurrence(spark):
    from tokenkit_spark.ops.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\n\nshared"),
            (2, "shared\n\nbeta\n\nshared"),  # cross-doc AND within-doc dup
            (3, "shared\n\n  \n\ngamma"),     # blank paragraph dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].text_dedup == "alpha\n\nshared" and out[1].n_removed == 0
    # doc 2 loses both copies of 'shared' (doc 1 owns it)
    assert out[2].text_dedup == "beta" and out[2].n_removed == 2
    assert out[3].text_dedup == "gamma" and out[3].n_kept == 1


def test_nested_agg_reverse_nested(spark):
    from pyspark.sql import Row

    from tokenkit_spark.ops.aggs import nested_terms_agg

    df = spark.createDataFrame(
        [
            Row(doc_id=1, comments=[Row(author="x", stars=4.0), Row(author="x", stars=2.0)]),
            Row(doc_id=2, comments=[Row(author="x", stars=3.0), Row(author="y", stars=5.0)]),
        ]
    )
    out = {r.key: r for r in nested_terms_agg(df, "comments", "author", "stars", "doc_id").collect()}
    # nested_count counts comments; parent_count (reverse_nested) counts docs
    assert out["x"].nested_count == 3 and out["x"].parent_count == 2
    assert abs(out["x"].avg_value - 3.0) < 1e-9
    assert out["y"].nested_count == 1 and out["y"].parent_count == 1
