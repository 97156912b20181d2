"""Sequential Dependence Model ranking, fully relational.

Metzler & Croft, "A Markov Random Field Model for Term Dependencies"
(SIGIR 2005) — the SDM instantiation every Indri/Galago/Anserini stack
ships as its strong bag-of-words+proximity baseline.  Score of doc d
for query q = t1..tn (query order, duplicates kept):

    SDM(q, d) =  w_T * sum_i  f_T(t_i, d)
               + w_O * sum_i  f_O(t_i t_{i+1}, d)
               + w_U * sum_i  f_U(t_i t_{i+1}, d)

with the published default weights (0.85, 0.10, 0.05) and each feature
a Dirichlet-smoothed log probability over its own "term" statistics:

    f_X = log((tf_X + mu * cf_X / T) / (dl + mu))

* **f_T** — unigram tf/cf (plain query likelihood).
* **f_O** — ordered-window #1: exact adjacent-pair occurrences
  (positions p, p+1), Indri's ``#1(ti ti+1)``.
* **f_U** — unordered-window #uw8: co-occurrences of the pair within
  any 8-term window (0 < |p1 - p2| < 8; for a self-pair ti == ti+1 the
  occurrence pair is counted once, p1 < p2).

Features whose collection frequency is zero are dropped (the pair
never co-occurs anywhere, so its smoothed probability is undefined —
Indri's behavior for OOV windows), as are OOV unigrams.  Candidate
docs = docs matching >= 1 in-vocabulary query unigram; their missing
features smooth through a left join (tf -> 0).

Scale shape: document positions explode once, are immediately
semi-joined down to query terms (a per-query handful), and every pair
count is a doc-keyed equi-join of those tiny filtered position
relations — the same bounded fan-out contract as index/spans.py.
Collection pair statistics are one extra groupBy over the per-doc pair
counts (map-side partials).  No UDFs, no driver loops; a million-query
batch shuffles on (doc) and (term-pair) keys only.

Determinism: final ranking pinned by (round(score, 4) desc, doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenkit_spark.index.bm25f import _topk


def _qtoks(queries: DataFrame) -> DataFrame:
    """(query_id, qpos, term): lowercased whitespace tokens in query
    order, duplicates kept — SDM scores every occurrence."""
    return queries.select(
        "query_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
            )
        ).alias("qpos", "term"),
    )


def sdm_search(
    docs: DataFrame,
    queries: DataFrame,
    mu: float = 2000.0,
    w_t: float = 0.85,
    w_o: float = 0.10,
    w_u: float = 0.05,
    window: int = 8,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k SDM retrieval; returns (query_id, rank, doc_id, score)."""
    qtoks = _qtoks(queries)
    qpairs = (
        qtoks.alias("a")
        .join(
            qtoks.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("b.qpos") == F.col("a.qpos") + 1),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.qpos").alias("qpos"),
            F.col("a.term").alias("t1"),
            F.col("b.term").alias("t2"),
        )
    )
    qterm_set = qtoks.select("term").distinct()

    toks = docs.select(
        id_col,
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("pos", "term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    globals_ = dl.agg(F.sum("dl").alias("total_tokens"))

    # positions restricted to query terms — tiny per doc
    qpos = toks.join(F.broadcast(qterm_set), "term")

    # unigram stats
    uni_tf = qpos.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    uni_cf = uni_tf.groupBy("term").agg(F.sum("tf").alias("cf"))

    # pair occurrence counts per doc: ordered (#1) and unordered (#uw8)
    pair_keys = qpairs.select("t1", "t2").distinct()
    a = qpos.alias("x").join(
        F.broadcast(pair_keys), F.col("x.term") == F.col("t1")
    )
    pair_pos = a.join(
        qpos.alias("y"),
        (F.col("y." + id_col) == F.col("x." + id_col))
        & (F.col("y.term") == F.col("t2")),
    ).select(
        F.col("x." + id_col).alias(id_col),
        "t1",
        "t2",
        F.col("x.pos").alias("p1"),
        F.col("y.pos").alias("p2"),
    )
    o_tf = (
        pair_pos.filter(F.col("p2") == F.col("p1") + 1)
        .groupBy(id_col, "t1", "t2")
        .agg(F.count(F.lit(1)).alias("otf"))
    )
    u_tf = (
        pair_pos.filter(
            F.when(
                F.col("t1") == F.col("t2"),
                (F.col("p1") < F.col("p2"))
                & (F.col("p2") - F.col("p1") < window),
            ).otherwise(
                (F.col("p1") != F.col("p2"))
                & (F.abs(F.col("p1") - F.col("p2")) < window)
            )
        )
        .groupBy(id_col, "t1", "t2")
        .agg(F.count(F.lit(1)).alias("utf"))
    )
    o_cf = o_tf.groupBy("t1", "t2").agg(F.sum("otf").alias("ocf"))
    u_cf = u_tf.groupBy("t1", "t2").agg(F.sum("utf").alias("ucf"))

    cand = (
        qtoks.select("query_id", "term")
        .distinct()
        .join(uni_tf.select("term", id_col), "term")
        .select("query_id", id_col)
        .distinct()
    )

    def smoothed(tf_col, cf_col):
        return F.log(
            (F.coalesce(tf_col, F.lit(0))
             + F.lit(mu) * cf_col / F.col("total_tokens"))
            / (F.col("dl") + F.lit(mu))
        )

    s_t = (
        cand.join(qtoks, "query_id")
        .join(uni_cf, "term")  # drops OOV unigrams
        .join(uni_tf, ["term", id_col], "left")
        .join(dl, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(F.sum(smoothed(F.col("tf"), F.col("cf"))).alias("s_t"))
    )

    def pair_score(tf_rel, cf_rel, tfc, cfc, out):
        return (
            cand.join(qpairs, "query_id")
            .join(cf_rel, ["t1", "t2"])  # drops never-co-occurring pairs
            .join(tf_rel, ["t1", "t2", id_col], "left")
            .join(dl, id_col)
            .crossJoin(F.broadcast(globals_))
            .groupBy("query_id", id_col)
            .agg(F.sum(smoothed(F.col(tfc), F.col(cfc))).alias(out))
        )

    s_o = pair_score(o_tf, o_cf, "otf", "ocf", "s_o")
    s_u = pair_score(u_tf, u_cf, "utf", "ucf", "s_u")

    scored = (
        s_t.join(s_o, ["query_id", id_col], "left")
        .join(s_u, ["query_id", id_col], "left")
        .select(
            "query_id",
            id_col,
            (
                F.lit(w_t) * F.col("s_t")
                + F.lit(w_o) * F.coalesce(F.col("s_o"), F.lit(0.0))
                + F.lit(w_u) * F.coalesce(F.col("s_u"), F.lit(0.0))
            ).alias("score"),
        )
    )
    return _topk(scored, k, round_digits)
