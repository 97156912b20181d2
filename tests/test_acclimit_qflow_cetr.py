"""Accumulator-limited evaluation (index/acclimit.py), query-flow
suggestions (ops/queryflow.py), CETR content extraction (ops/cetr.py)."""

from pyspark.sql import functions as F

from tokenkit_spark.index.acclimit import accumulator_limited_audit
from tokenkit_spark.ops.cetr import extract_content, line_tag_ratios
from tokenkit_spark.ops.queryflow import query_flow_edges, query_suggestions


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, text string")


# ------------------------------------------------- accumulator limiting


def test_acclimit_unlimited_budget_is_exact(spark):
    docs = _docs(
        spark,
        [(i, f"alpha beta gamma w{i}") for i in range(6)]
        + [(6, "alpha alpha alpha"), (7, "beta beta")],
    )
    qs = _queries(spark, [(0, "alpha beta")])
    out = accumulator_limited_audit(docs, qs, limit=1000, k=10).collect()
    by_mode = {r.mode: r for r in out}
    assert set(by_mode) == {"quit", "continue"}
    for r in out:
        # budget never reached: both modes keep everything and agree
        # with the exact ranking
        assert r.n_acc == 8
        assert r.overlap_k == 8
        assert r.top1_same == 1


def test_acclimit_continue_admits_rarest_first(spark):
    # 'rare' (df=2) processed before 'common' (df=5); budget 2 admits
    # exactly the two 'rare' docs, which then accumulate their full
    # BM25 score including the 'common' term.
    docs = _docs(
        spark,
        [
            (1, "rare common"),
            (2, "rare"),
            (3, "common"),
            (4, "common"),
            (5, "common"),
            (6, "common x"),
        ],
    )
    qs = _queries(spark, [(0, "rare common")])
    out = {
        r.mode: r
        for r in accumulator_limited_audit(docs, qs, limit=2, k=10).collect()
    }
    assert out["continue"].n_acc == 2
    # quit stops after the term that filled the budget ('rare', both
    # its postings complete) -> also 2 accumulators here
    assert out["quit"].n_acc == 2


def test_acclimit_quit_completes_triggering_term(spark):
    # budget 1: term 'aa' (df=2, rarest) fills it mid-term; boundary
    # check means BOTH aa docs get accumulators before quitting.
    docs = _docs(
        spark,
        [(1, "aa bb"), (2, "aa"), (3, "bb"), (4, "bb"), (5, "bb")],
    )
    qs = _queries(spark, [(0, "aa bb")])
    out = {
        r.mode: r
        for r in accumulator_limited_audit(docs, qs, limit=1, k=10).collect()
    }
    assert out["quit"].n_acc == 2
    assert out["continue"].n_acc == 1


# -------------------------------------------------------- query flow


def _qlog(spark, rows):
    return spark.createDataFrame(
        rows, "session_id long, step long, query string"
    )


def test_query_flow_edge_probabilities(spark):
    log = _qlog(
        spark,
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
            (2, 1, "a"), (2, 2, "b"),
            (3, 1, "a"), (3, 2, "c"),
        ],
    )
    edges = {
        (r.src, r.dst): (r.cnt, r.prob)
        for r in query_flow_edges(log).collect()
    }
    assert edges[("a", "b")][0] == 2
    assert abs(edges[("a", "b")][1] - 2 / 3) < 1e-9
    assert edges[("a", "c")][0] == 1
    assert edges[("b", "a")] == (1, 1.0)


def test_query_flow_self_loops_and_session_breaks_excluded(spark):
    log = _qlog(
        spark,
        [
            (1, 1, "a"), (1, 2, "a"),  # self loop: dropped
            (2, 1, "b"),               # session of one: no edge
        ],
    )
    assert query_flow_edges(log).count() == 0


def test_query_suggestions_min_support_and_rank(spark):
    rows = []
    # a->b 3 times, a->c 2 times, a->d once (below support)
    for s, dst in enumerate(["b", "b", "b", "c", "c", "d"]):
        rows += [(s, 1, "a"), (s, 2, dst)]
    out = query_suggestions(
        _qlog(spark, rows), min_support=2, top_n=3
    ).collect()
    got = [(r.rank, r.suggestion, r.cnt) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(1, "b", 3), (2, "c", 2)]


# -------------------------------------------------------------- CETR


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_cetr_ttr_per_line(spark):
    pages = _pages(spark, [(1, "<a></a>\nplain prose line\n<b>x</b>")])
    rows = {r.line_no: r for r in line_tag_ratios(pages).collect()}
    assert rows[0].n_tags == 2 and rows[0].text_chars == 0
    assert rows[1].n_tags == 0 and rows[1].ttr == float(len("plain prose line"))
    assert rows[2].n_tags == 2 and rows[2].text_chars == 1


def test_cetr_extracts_prose_drops_chrome(spark):
    html = "\n".join(
        [
            '<div><a href="/">Home</a><a href="/b">B</a></div>',
            "<p>this is a long run of plain article prose text</p>",
            "<p>and a second long run of plain article prose</p>",
            "<span>x</span><span>y</span><span>z</span>",
        ]
    )
    out = extract_content(_pages(spark, [(1, html)])).collect()[0]
    assert out.n_lines == 4
    assert 1 <= out.n_content_lines <= 2
    assert "article prose" in out.content
    assert "Home" not in out.content


def test_cetr_empty_page_row_survives(spark):
    out = extract_content(_pages(spark, [(1, "<a></a>")])).collect()
    assert len(out) == 1
    # the single all-tag line has ttr 0 == threshold 0 -> kept but empty
    assert out[0].content == ""
