"""CDX/SURT source (sources/cdx.py) and robots.txt filtering
(ops/robots.py, RFC 9309)."""

import pytest
from pyspark.sql import functions as F

from tokenkit_spark.ops import robots
from tokenkit_spark.sources import cdx


def test_surt_key(spark):
    cases = [
        ("https://www.Example.com:443/a/b?b=2&a=1#frag", "com,example)/a/b?a=1&b=2"),
        ("http://sub.site.org:80/", "org,site,sub)/"),
        ("https://host.net", "net,host)/"),
        ("http://h.io/p?z=1", "io,h)/p?z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.k for r in df.select(cdx.surt_key(F.col("url")).alias("k")).collect()]
    assert got == [w for _, w in cases]


def test_cdx_roundtrip(spark, tmp_path):
    recs = spark.createDataFrame(
        [
            ("https://www.a.com/x?b=2&a=1", "20240101000000", 200, "sha1:AAA", 123),
            ("http://b.org/", "20240102000000", 404, "sha1:BBB", 45),
        ],
        "url string, timestamp string, status int, digest string, length long",
    )
    lines = cdx.cdx_lines(recs)
    out = str(tmp_path / "cdx")
    lines.coalesce(1).write.mode("overwrite").text(out)
    back = cdx.read_cdx(spark, out).orderBy("timestamp").collect()
    assert [r.urlkey for r in back] == ["com,a)/x?a=1&b=2", "org,b)/"]
    assert [r.status for r in back] == [200, 404]
    assert [r.length for r in back] == [123, 45]
    assert back[0].url == "https://www.a.com/x?b=2&a=1"


ROBOTS = """# crawler policy
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: fastbot
User-agent: slowbot
Disallow: /
Allow: /public*.html$
"""


def test_parse_robots_groups(spark):
    df = spark.createDataFrame([("a.com", ROBOTS)], "host string, body string")
    rules = robots.parse_robots(df).collect()
    by_agent = {}
    for r in rules:
        by_agent.setdefault(r.agent, set()).add((r.allow, r.prefix))
    assert by_agent["*"] == {(False, "/private/"), (True, "/private/ok")}
    # both agents in the second group get BOTH rules
    assert by_agent["fastbot"] == by_agent["slowbot"] == {
        (False, "/"),
        (True, "/public*.html$"),
    }


def test_crawl_allowed_longest_match_wins(spark):
    rdf = robots.parse_robots(
        spark.createDataFrame([("a.com", ROBOTS)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [
            ("a.com", "/private/secret"),   # disallowed by /private/
            ("a.com", "/private/ok/page"),  # allowed: longer Allow rule
            ("a.com", "/open"),             # no rule -> allowed
            ("b.com", "/private/secret"),   # no robots for host -> allowed
        ],
        "host string, path string",
    )
    out = {(r.host, r.path): r.allowed for r in robots.crawl_allowed(urls, rdf, "*").collect()}
    assert out == {
        ("a.com", "/private/secret"): False,
        ("a.com", "/private/ok/page"): True,
        ("a.com", "/open"): True,
        ("b.com", "/private/secret"): True,
    }


def test_crawl_allowed_wildcards(spark):
    rdf = robots.parse_robots(
        spark.createDataFrame([("a.com", ROBOTS)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [
            ("a.com", "/public-index.html"),  # matches Allow /public*.html$
            ("a.com", "/public-index.html5"), # $ anchor: no Allow -> Disallow /
            ("a.com", "/anything"),           # Disallow / wins
        ],
        "host string, path string",
    )
    out = {r.path: r.allowed for r in robots.crawl_allowed(urls, rdf, "fastbot").collect()}
    assert out == {
        "/public-index.html": True,
        "/public-index.html5": False,
        "/anything": False,
    }


def test_crawl_delays_groups(spark):
    from tokenkit_spark.ops.robots import crawl_delays

    body = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
        "\nUser-agent: fastbot\nUser-agent: otherbot\nCrawl-delay: 0.5\n"
        "\nUser-agent: badbot\nCrawl-delay: notanumber\n"
    )
    df = spark.createDataFrame([("h.com", body)], "host string, body string")
    out = {(r.host, r.agent): r.delay_s for r in crawl_delays(df).collect()}
    assert out[("h.com", "*")] == 2.0
    # a group's delay attaches to EVERY agent named in the group
    assert out[("h.com", "fastbot")] == 0.5
    assert out[("h.com", "otherbot")] == 0.5
    assert ("h.com", "badbot") not in out  # non-numeric dropped


def test_change_rates_estimator(spark):
    import math

    from tokenkit_spark.ops.recrawl import change_rates

    hist = spark.createDataFrame(
        [
            ("a", 10, 3, 2.0),   # lambda = -ln(0.7)/2
            ("b", 4, 0, 1.0),    # never changed -> max revisit
            ("c", 5, 5, 1.0),    # changed every visit -> X capped at 4.5
        ],
        "url string, n_visits int, n_changed int, interval_days double",
    )
    out = {r.url: r for r in change_rates(hist).collect()}
    assert abs(out["a"].lambda_hat - (-math.log(0.7) / 2)) < 1e-6
    assert abs(out["a"].revisit_days - 1 / (-math.log(0.7) / 2)) < 1e-4
    assert out["b"].lambda_hat == 0.0 and out["b"].revisit_days == 120.0
    assert abs(out["c"].lambda_hat - (-math.log(0.5 / 5) / 1.0)) < 1e-6
    assert out["c"].revisit_days == 0.5  # pinned to the fastest cadence
