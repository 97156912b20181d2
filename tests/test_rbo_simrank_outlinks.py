"""RBO, pruned SimRank, and outlink extraction on hand-built cases."""

import math

from pyspark.sql import functions as F

from tokenkit_spark.index.rankeval import rbo
from tokenkit_spark.ops.linkgraph import simrank_pairs
from tokenkit_spark.ops.outlinks import extract_outlinks


def test_rbo_identical_and_disjoint(spark):
    a = spark.createDataFrame(
        [(0, r, r + 100) for r in range(1, 11)]
        + [(1, r, r + 100) for r in range(1, 11)],
        "query_id long, rank long, doc_id long",
    )
    b = spark.createDataFrame(
        [(0, r, r + 100) for r in range(1, 11)]       # identical
        + [(1, r, r + 500) for r in range(1, 11)],    # disjoint
        "query_id long, rank long, doc_id long",
    )
    out = {r.query_id: r.rbo_k for r in rbo(a, b, k=10, p=0.9).collect()}
    # identical prefixes: X_d = d -> RBO = (1-p) sum p^(d-1) = 1 - p^10
    assert abs(out[0] - (1 - 0.9 ** 10)) < 2e-6
    assert out[1] == 0.0


def test_rbo_one_common_doc_at_head(spark):
    a = spark.createDataFrame(
        [(0, 1, 7), (0, 2, 8)], "query_id long, rank long, doc_id long"
    )
    b = spark.createDataFrame(
        [(0, 1, 7), (0, 2, 9)], "query_id long, rank long, doc_id long"
    )
    out = rbo(a, b, k=2, p=0.5).collect()[0]
    # X_1 = 1, X_2 = 1 -> (1-p)(p^0*1/1 + p^1*1/2) = .5*(1+.25)
    assert abs(out.rbo_k - 0.625) < 2e-6


def test_simrank_two_papers_cited_together(spark):
    # classic example: w cites a and b -> s1(a,b) = C
    edges = spark.createDataFrame(
        [(100, 1), (100, 2)], "src long, dst long"
    )
    rows = simrank_pairs(edges, c=0.8, iterations=1, k=10).collect()
    assert len(rows) == 1
    assert rows[0].src == 1 and rows[0].dst == 2
    assert abs(rows[0].simrank - 0.8) < 1e-9


def test_simrank_second_iteration_propagates(spark):
    # v,w both cite a and b; u cites v and w.  x cites a only; pair
    # (a,b): I(a)={v,w,x}? keep it minimal:
    # edges: u->v, u->w, v->a, v->b, w->a, w->b
    # s1(v,w) = C (share in-neighbor u, 1/(1*1))
    # s1(a,b) = C/(2*2) * [s0 diag pairs: (v,v),(w,w) -> 2] = C/2
    # s2(a,b) = C/4 * [2 (diag) + s1(v,w) * 2 (pairs (v,w),(w,v))]
    #         = C/4 * (2 + 2C)
    edges = spark.createDataFrame(
        [(50, 60), (50, 61), (60, 1), (60, 2), (61, 1), (61, 2)],
        "src long, dst long",
    )
    rows = {
        (r.src, r.dst): r.simrank
        for r in simrank_pairs(edges, c=0.8, iterations=2, k=10).collect()
    }
    assert abs(rows[(60, 61)] - 0.8) < 1e-9
    assert abs(rows[(1, 2)] - 0.8 / 4 * (2 + 2 * 0.8)) < 1e-9


def test_extract_outlinks_resolution_cases(spark):
    html = (
        '<html><body>'
        '<a href="https://other.example/x">abs</a>'
        '<a href="//cdn.example/y">proto</a>'
        '<a href="/root/z">root</a>'
        '<a href="sub/w.html">rel</a>'
        '<a href="next.html#frag">frag</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="/nf" rel="nofollow">nf</a>'
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://site.example.org/dir/page.html", bytearray(html))],
        "url string, html binary",
    )
    rows = {r.href: r for r in extract_outlinks(pages).collect()}
    assert rows["https://other.example/x"].resolved_url == "https://other.example/x"
    assert rows["//cdn.example/y"].resolved_url == "https://cdn.example/y"
    assert rows["/root/z"].resolved_url == "https://site.example.org/root/z"
    assert (
        rows["sub/w.html"].resolved_url
        == "https://site.example.org/dir/sub/w.html"
    )
    assert (
        rows["next.html#frag"].resolved_url
        == "https://site.example.org/dir/next.html"
    )
    assert "mailto:a@b.c" not in rows
    assert rows["/nf"].nofollow and not rows["/root/z"].nofollow
    assert rows["/root/z"].anchor_text == "root"
