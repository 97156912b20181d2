"""PageRank + in-link rollups (ops/linkgraph.py).

Contract: Page et al. 1999 with uniform teleport and dangling-mass
redistribution; fixed-iteration recurrence pinned against a numpy
power-iteration replay.
"""

import numpy as np
import pytest

from tokenkit_spark.ops import linkgraph


@pytest.fixture(scope="module")
def edges(spark):
    # 0 -> 1,2 ; 1 -> 2 ; 2 -> 0 ; 3 -> 2 ; 4 is dangling (in-link only)
    e = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4)]
    return spark.createDataFrame(e, "src long, dst long").cache()


def _numpy_pagerank(e, n, n_iter, d):
    deg = np.zeros(n)
    for s, _ in e:
        deg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = pr[deg == 0].sum()
        nxt = np.full(n, (1 - d) / n) + d * dangling / n
        for s, t in e:
            nxt[t] += d * pr[s] / deg[s]
        pr = nxt
    return pr


def test_pagerank_matches_numpy(spark, edges):
    e = [(r.src, r.dst) for r in edges.collect()]
    want = _numpy_pagerank(e, 5, n_iter=5, d=0.85)
    got = {r.node: r.pr for r in linkgraph.pagerank(edges, n_iter=5).collect()}
    for node in range(5):
        assert abs(got[node] - want[node]) < 1e-12
    # probability mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_ordering_sensible(spark, edges):
    top = linkgraph.top_pagerank(edges, k=5, n_iter=20).collect()
    assert [r.rank for r in top] == [1, 2, 3, 4, 5]
    # node 2 has the most in-links (from 0, 1, 3) -> highest rank;
    # at 20 iterations 0 (fed by 2) beats the leaf 4
    assert top[0].node == 2
    assert top[1].node == 0


def test_inlink_stats(spark, edges):
    out = {r.dst: (r.n_inlinks, r.n_sources) for r in linkgraph.inlink_stats(edges).collect()}
    assert out[2] == (3, 3)
    assert out[0] == (1, 1)
    assert out[4] == (1, 1)


def test_hits_star_graph(spark):
    """Many hubs -> one authority: the target must dominate auth, the
    pointers must dominate hub, and L2 norms must be 1."""
    from tokenkit_spark.ops.linkgraph import hits

    edges = spark.createDataFrame(
        [(i, 100) for i in range(5)] + [(1, 2)], "src long, dst long"
    )
    rows = {r.node: (r.hub, r.auth) for r in hits(edges, n_iter=3).collect()}
    assert max(rows, key=lambda n: rows[n][1]) == 100  # top authority
    assert rows[100][0] == 0.0  # pure sink: no hub score
    hub_norm = sum(h * h for h, _ in rows.values()) ** 0.5
    auth_norm = sum(a * a for _, a in rows.values()) ** 0.5
    assert abs(hub_norm - 1.0) < 1e-9 and abs(auth_norm - 1.0) < 1e-9


def test_hits_matches_numpy_power_iteration(spark):
    """Exact fixed-iteration parity with a numpy replica of the same
    recurrence (a = norm(A^T h); h = norm(A a))."""
    import numpy as np

    from tokenkit_spark.ops.linkgraph import hits

    e = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (3, 2)]
    edges = spark.createDataFrame(e, "src long, dst long")
    A = np.zeros((4, 4))
    for s, d in e:
        A[s, d] = 1.0
    h = np.ones(4)
    for _ in range(4):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    rows = {r.node: (r.hub, r.auth) for r in hits(edges, n_iter=4).collect()}
    for n in range(4):
        assert abs(rows[n][0] - h[n]) < 1e-9
        assert abs(rows[n][1] - a[n]) < 1e-9


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from tokenkit_spark.ops.linkgraph import pagerank, personalized_pagerank

    e = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]  # two 3-cycles
    edges = spark.createDataFrame(e, "src long, dst long")
    pr = {r.node: r.pr for r in personalized_pagerank(edges, [0], 8).collect()}
    # all mass stays in the seed's component; the other cycle gets none
    assert pr[3] == pr[4] == pr[5] == 0.0
    assert pr[0] > pr[1] > 0 and pr[2] > 0
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    # uniform pagerank by contrast spreads over both cycles
    upr = {r.node: r.pr for r in pagerank(edges, 8).collect()}
    assert upr[3] > 0.1


def test_personalized_pagerank_validation(spark):
    from tokenkit_spark.ops.linkgraph import personalized_pagerank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    import pytest as pt
    with pt.raises(ValueError):
        personalized_pagerank(edges, [])


def test_weighted_pagerank_mass_and_weights(spark):
    from tokenkit_spark.ops.linkgraph import weighted_pagerank

    # 0 sends 90% of its weight to 1, 10% to 2
    edges = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, weight double",
    )
    pr = {r.node: r.pr for r in weighted_pagerank(edges, 10).collect()}
    assert pr[1] > pr[2]  # weight asymmetry must show
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)


def test_textrank_connective_term_wins(spark):
    from tokenkit_spark.ops.textstats import textrank_keywords

    docs = spark.createDataFrame(
        [
            (0, "spark engine"), (1, "spark shuffle"), (2, "spark catalyst"),
            (3, "spark tungsten"), (4, "parquet files"), (5, "parquet files"),
        ],
        "doc_id long, text string",
    )
    rows = textrank_keywords(docs, top_n=5).collect()
    assert rows[0].term == "spark"  # the hub term outranks frequent pairs


def test_triangle_counts_k4(spark):
    from tokenkit_spark.ops.linkgraph import triangle_counts

    # K4 (complete graph on 4 nodes): C(3,2)=3 triangles per node,
    # 4 triangles total, clustering 1.0 everywhere; edges given in
    # mixed directions with a duplicate to exercise the undirecting
    e = [(0, 1), (1, 0), (0, 2), (0, 3), (2, 1), (1, 3), (3, 2)]
    rows = triangle_counts(
        spark.createDataFrame(e, "src long, dst long"), k=10
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.degree, r.triangles, r.clustering) == (3, 3, 1.0)


def test_triangle_counts_path_has_none(spark):
    from tokenkit_spark.ops.linkgraph import triangle_counts

    rows = triangle_counts(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    ).collect()
    assert all(r.triangles == 0 and r.clustering == 0.0 for r in rows)


def test_pointer_doubling_resolves_long_chain(spark):
    from tokenkit_spark.ops.linkgraph import resolve_pointer_chains

    # chain 1->2->...->8 (length 7 hops): 3 doublings resolve up to 2^3
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    got = {r.src: r.final for r in resolve_pointer_chains(edges, 3).collect()}
    assert got == {i: 8 for i in range(1, 8)}
    # 2 doublings (max 4 hops) must NOT fully resolve the head
    partial = {r.src: r.final for r in resolve_pointer_chains(edges, 2).collect()}
    assert partial[1] == 5 and partial[4] == 8
