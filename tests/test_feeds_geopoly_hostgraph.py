"""Feed parsing (sources/feeds.py), geo_polygon ray casting
(ops/geo.py), host-graph rollup (ops/linkgraph.py)."""

import datetime

from pyspark.sql import functions as F

from tokenkit_spark.ops.geo import geo_polygon
from tokenkit_spark.ops.linkgraph import host_graph, host_graph_stats
from tokenkit_spark.sources.feeds import fresh_items, parse_feeds


def _feeds(spark, rows):
    return spark.createDataFrame(rows, "host string, body string")


RSS = (
    '<rss version="2.0"><channel><title>t</title>'
    "<item><title>hello</title>"
    "<link>https://a.example/p/1?x=1&amp;y=2</link>"
    "<guid>g1</guid>"
    "<pubDate>Tue, 05 Mar 2024 09:15:30 GMT</pubDate></item>"
    "<item><title>no date</title><link>https://a.example/p/2</link></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom">'
    "<entry><title>atom one</title>"
    '<link rel="alternate" href="https://b.example/a/1"/>'
    "<id>a1</id><updated>2024-04-01T12:00:05Z</updated></entry>"
    "</feed>"
)


def test_parse_rss_items(spark):
    out = {
        r.guid: r
        for r in parse_feeds(_feeds(spark, [("a", RSS)])).collect()
    }
    r1 = out["g1"]
    assert r1.kind == "rss" and r1.title == "hello"
    assert r1.link == "https://a.example/p/1?x=1&y=2"  # &amp; decoded
    assert r1.published == datetime.datetime(2024, 3, 5, 9, 15, 30)
    r2 = out[None]
    assert r2.title == "no date" and r2.published is None


def test_parse_atom_entries(spark):
    rows = parse_feeds(_feeds(spark, [("b", ATOM)])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.kind == "atom" and r.guid == "a1"
    assert r.link == "https://b.example/a/1"  # href attribute
    assert r.published == datetime.datetime(2024, 4, 1, 12, 0, 5)


def test_fresh_items_keeps_undated(spark):
    entries = parse_feeds(_feeds(spark, [("a", RSS), ("b", ATOM)]))
    fresh = fresh_items(entries, "2024-03-31 00:00:00")
    links = {r.link for r in fresh.collect()}
    # atom item (2024-04-01) is fresh; dated rss (2024-03-05) is not;
    # undated rss item kept to be safe
    assert links == {"https://b.example/a/1", "https://a.example/p/2"}


# -------------------------------------------------------- geo_polygon


def test_geo_polygon_unit_square(spark):
    square = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 15.0, 5.0), (3, 5.0, -1.0), (4, -5.0, 5.0)],
        "pid long, lat double, lon double",
    )
    out = {r.pid: r.inside for r in geo_polygon(pts, square).collect()}
    assert out == {1: True, 2: False, 3: False, 4: False}


def test_geo_polygon_concave(spark):
    # arrow-head: concave notch at the bottom
    poly = [(0.0, 0.0), (10.0, 5.0), (0.0, 10.0), (4.0, 5.0)]
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 1.0, 5.0)],
        "pid long, lat double, lon double",
    )
    out = {r.pid: r.inside for r in geo_polygon(pts, poly).collect()}
    assert out[1] is True     # inside the head
    assert out[2] is False    # inside the notch (excluded)


# --------------------------------------------------------- host graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_host_graph_drops_intra_host_and_counts(spark):
    # host = id % 2
    e = _edges(spark, [(0, 1), (0, 3), (2, 1), (1, 2), (0, 2)])
    he = host_graph(
        e,
        (F.col("src") % 2).cast("string"),
        (F.col("dst") % 2).cast("string"),
    )
    got = {(r.src_host, r.dst_host): r.n_links for r in he.collect()}
    # (0,2) is intra-host (both even) and drops
    assert got == {("0", "1"): 3, ("1", "0"): 1}


def test_host_graph_stats_reciprocity(spark):
    he = spark.createDataFrame(
        [("a", "b", 2), ("b", "a", 1), ("a", "c", 1)],
        "src_host string, dst_host string, n_links long",
    )
    r = host_graph_stats(he).collect()[0]
    assert r.n_hosts == 3 and r.n_edges == 3
    assert r.n_reciprocal == 2  # a->b and b->a
    assert abs(r.reciprocity - 2 / 3) < 1e-6  # rounded to 6 dp
    assert abs(r.avg_out_degree - 1.5) < 1e-9  # a:2, b:1
