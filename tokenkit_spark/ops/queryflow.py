"""Query-flow graph — session reformulation mining and query
suggestion (Boldi, Bonchi, Castillo, Donato, Gionis & Vigna, "The
Query-Flow Graph: Model and Applications", CIKM 2008).

A search log's sessions induce a directed graph over queries: an edge
q -> q' for every consecutive pair inside one session with q != q'.
Edge weights are transition counts; normalizing by the source query's
total outgoing reformulations gives the empirical transition
probability P(q'|q) — the paper's weighting before the chaining
classifier, and the direct input to "people also searched for"
suggestion lists.

Relational shape (the 100-TB story): one window (lead over the
session, ordered by an explicit monotone column — never a global
sort), one hash aggregate per edge, one per-source aggregate that
rides the same (src) key, and a per-source rank window bounded by the
suggestion cut.  Session logs shard perfectly on session_id; nothing
is collected.

Reference scope: graph construction + count/probability weighting per
the paper; the chaining classifier (needs labeled session breaks) is
out of scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def query_flow_edges(
    qlog: DataFrame,
    session_col: str = "session_id",
    order_col: str = "step",
    query_col: str = "query",
) -> DataFrame:
    """(src, dst, cnt, prob): consecutive in-session reformulation
    pairs with counts and P(dst|src)."""
    w = Window.partitionBy(session_col).orderBy(order_col)
    pairs = (
        qlog.withColumn("_nxt", F.lead(query_col).over(w))
        .filter(
            F.col("_nxt").isNotNull() & (F.col("_nxt") != F.col(query_col))
        )
        .select(F.col(query_col).alias("src"), F.col("_nxt").alias("dst"))
    )
    edges = pairs.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    out = edges.groupBy("src").agg(F.sum("cnt").alias("out_cnt"))
    return edges.join(out, "src").select(
        "src", "dst", "cnt", (F.col("cnt") / F.col("out_cnt")).alias("prob")
    )


def query_suggestions(
    qlog: DataFrame,
    min_support: int = 2,
    top_n: int = 3,
    session_col: str = "session_id",
    order_col: str = "step",
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Top-n query-flow suggestions per source query:
    (src, rank, suggestion, cnt, prob).  Edges below ``min_support``
    observations are dropped BEFORE ranking (the paper prunes noise
    edges the same way); ties break on (cnt desc, dst asc)."""
    edges = query_flow_edges(qlog, session_col, order_col, query_col)
    kept = edges.filter(F.col("cnt") >= min_support)
    w = Window.partitionBy("src").orderBy(
        F.col("prob").desc(), F.col("cnt").desc(), F.col("dst").asc()
    )
    return (
        kept.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select(
            "src",
            "rank",
            F.col("dst").alias("suggestion"),
            "cnt",
            F.round("prob", round_digits).alias("prob"),
        )
    )


def keystroke_savings(
    qlog: DataFrame,
    top_n: int = 3,
    query_col: str = "query",
    round_digits: int = 4,
) -> DataFrame:
    """Minimal-keystrokes (MKS) evaluation of frequency-ranked query
    auto-completion (the standard QAC metric — Duan & Hsu, "Online
    Spelling Correction for Query Completion", EMNLP 2011; used for
    the MostPopularCompletion baseline of Bar-Yossef & Kraus, WWW
    2011): for each distinct logged query, the fewest typed characters
    p such that the query appears in the top-``top_n`` completions of
    its own p-character prefix, completions ranked by log frequency
    (count desc, query asc — deterministic).  Typing the full query
    always "succeeds" at p = length (selection from the full-string
    bucket), so MKS is well-defined even for queries outranked at
    every prefix.

    Output per query: (query, n_issued, q_len, min_prefix,
    saved_frac) with saved_frac = 1 - min_prefix/q_len.

    Scale shape: the prefix relation is |distinct queries| × max_len —
    dictionary-sized, never log-sized (the log collapses to counts
    first); candidate matching is a prefix equi-join on the prefix
    string; ranking is a window partitioned by prefix.  Everything
    shuffles on dictionary keys only."""
    counts = qlog.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_issued"))
    d = counts.select(
        F.col(query_col).alias("q"), "n_issued",
        F.length(query_col).alias("q_len"),
    )
    # every prefix of every dictionary query
    prefixes = d.select(
        "q",
        F.explode(F.sequence(F.lit(1), F.col("q_len"))).alias("p"),
    ).select("q", "p", F.expr("substring(q, 1, p)").alias("pref"))
    # candidates per prefix: dictionary queries starting with it
    cand = (
        prefixes.select(F.col("pref").alias("cpref"))
        .distinct()
        .join(
            d.select(F.col("q").alias("c"), F.col("n_issued").alias("cn")),
            F.col("c").startswith(F.col("cpref")),
        )
    )
    w = Window.partitionBy("cpref").orderBy(
        F.col("cn").desc(), F.col("c").asc()
    )
    top = cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_n
    )
    hit = (
        prefixes.join(
            top,
            (F.col("pref") == F.col("cpref")) & (F.col("q") == F.col("c")),
        )
        .groupBy(F.col("q").alias("hq"))
        .agg(F.min("p").alias("min_prefix"))
    )
    return (
        d.join(hit, d["q"] == hit["hq"], "left")
        .select(
            d["q"].alias(query_col),
            "n_issued",
            "q_len",
            F.coalesce("min_prefix", F.col("q_len")).alias("min_prefix"),
        )
        .withColumn(
            "saved_frac",
            F.round(
                1.0 - F.col("min_prefix") / F.col("q_len"), round_digits
            ),
        )
    )


def suggestion_mrr(
    qlog: DataFrame,
    session_col: str = "session_id",
    step_col: str = "step",
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Self-evaluation of the query-flow suggestion model: next-query
    MRR.

    The standard offline eval for session-based suggestion (the
    protocol of Boldi et al. CIKM 2008 §5 / Sordoni et al. CIKM
    2015): for every observed in-session transition src -> dst, rank
    all candidate successors of src by empirical P(dst|src) (count
    desc, ties by query text) and score the ACTUAL next query's
    reciprocal rank; hit@1 is the top-1 exact-match rate.  The model
    is trained on the full log (in-sample — the point is a
    determinism-preserving harness; a split would just subset the
    transitions).

    Per source query: (src, n_transitions, n_candidates, mrr, hit_at1).
    Scale shape: transitions from one lag window per session; the
    model is the (src, dst) count table; the eval is a join of
    transitions against the ranked model — all hash joins on query
    keys.
    """
    w = Window.partitionBy(session_col).orderBy(step_col)
    trans = (
        qlog.withColumn("nxt", F.lead(query_col).over(w))
        .filter(F.col("nxt").isNotNull())
        .filter(F.col("nxt") != F.col(query_col))
        .select(F.col(query_col).alias("src"), F.col("nxt").alias("dst"))
    )
    model = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c")
    )
    wr = Window.partitionBy("src").orderBy(
        F.col("c").desc(), F.col("dst").asc()
    )
    ranked = model.withColumn("r", F.row_number().over(wr))
    n_cand = ranked.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    evald = trans.join(ranked, ["src", "dst"])
    return (
        evald.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(F.avg(1.0 / F.col("r")), round_digits).alias("mrr"),
            F.round(
                F.avg((F.col("r") == 1).cast("double")), round_digits
            ).alias("hit_at1"),
        )
        .join(n_cand, "src")
        .select(
            "src", "n_transitions", "n_candidates", "mrr", "hit_at1"
        )
    )
