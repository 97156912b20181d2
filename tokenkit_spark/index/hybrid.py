"""Hybrid retrieval: Reciprocal-Rank-Fusion of lexical (BM25) and vector
(cosine) rankings, plus the ``multi_match`` cross_fields scoring mode.

The reference's host application is a BM25 search stack (reference:
README.md:509-553); modern deployments of the same stack serve hybrid
lexical+vector queries fused with RRF (the ES 8.x ``rrf`` retriever and
Lucene's BlendedTermQuery are the public contracts these follow).

Scale shapes:

* ``rrf_fuse`` unions per-retriever rank lists (each already truncated to
  a window of size w, so the union is |queries| x w x retrievers rows —
  tiny relative to the corpus) and hash-aggregates the RRF sum.  No
  per-doc work outside the candidate windows, which is exactly the ES
  contract (rank_window_size).
* ``cross_fields`` is term-centric: per-field postings are unioned and
  re-aggregated so each (term, doc) carries per-field tf, then the
  blended idf (max df across fields — Lucene BlendedTermQuery's
  ``max_doc_freq`` blend) scores the best field occurrence.  Joins are
  the same broadcast-query-terms shape as bm25_brute; nothing new
  shuffles at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import AnalyzerConfig
from .build import tokens_df
from .query import K1, B, _doc_globals, _idf, _topk_window, analyze_queries


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Fuse ranked lists with Reciprocal Rank Fusion:
    ``score(d) = Σ_r 1 / (k_const + rank_r(d))`` over the retrievers
    where d appears (the ES rrf retriever formula, k=60 default).

    Each input carries (query_id, rank, doc_id).  Docs missing from a
    retriever's window simply contribute nothing (ES semantics)."""
    tagged = None
    for r in rankings:
        contrib = r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank"))).alias("c"),
        )
        tagged = contrib if tagged is None else tagged.unionByName(contrib)
    fused = tagged.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("rrf_score"), F.count(F.lit(1)).alias("n_retrievers")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("rrf_score"), round_digits).desc(),
        F.col("doc_id").asc(),
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.round("rrf_score", round_digits).alias("rrf_score"),
            "n_retrievers",
        )
    )


def cosine_ranking(
    embeddings: DataFrame,
    query_vec: list[float],
    query_id: int = 0,
    window: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    include_score: bool = False,
) -> DataFrame:
    """Vector retriever leg: exact cosine top-``window`` as a rank list
    (query_id, rank, doc_id[, score when ``include_score``]).  The dot product runs JVM-side via
    ``zip_with``/``aggregate`` lambdas; the top-N is the standard
    rank-then-limit AQE shape.  At 10^12 docs this leg swaps to the IVF
    path (ops/similarity.py) — the fusion contract is unchanged."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(sum(x * x for x in query_vec)) ** 0.5
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    scored = embeddings.select(
        F.col(id_col).alias("doc_id"),
        (dot / (norm * F.lit(qn))).alias("cosine"),
    )
    w = Window.orderBy(F.round("cosine", round_digits).desc(), F.col("doc_id").asc())
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= window)
    )
    cols = [F.lit(query_id).cast("long").alias("query_id"), "rank", "doc_id"]
    if include_score:
        cols.append(F.round("cosine", round_digits).alias("score"))
    return ranked.select(*cols)


def comb_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """CombSUM / CombMNZ metasearch fusion (Fox & Shaw, TREC-2 1994)
    with per-retriever min-max score normalization (Lee, SIGIR 1997):

        norm_r(d)   = (s_r(d) - min_r) / (max_r - min_r)   within each
                      retriever's candidate window (1.0 when max=min)
        CombSUM(d)  = Σ_r norm_r(d)
        CombMNZ(d)  = CombSUM(d) · |{r : d ∈ r}|

    Each input carries (query_id, rank, doc_id, score). Output ranked
    by CombMNZ (ties: doc_id asc) — the variant Lee found strongest.

    Scale shape: identical to ``rrf_fuse`` — the inputs are already
    rank-window-truncated, so normalization (one window per retriever
    per query over ≤ w rows) and the fusion hash-aggregate never touch
    the corpus."""
    tagged = None
    for i, r in enumerate(rankings):
        wq = Window.partitionBy("query_id")
        contrib = r.select(
            "query_id",
            "doc_id",
            F.when(
                F.max("score").over(wq) == F.min("score").over(wq), F.lit(1.0)
            )
            .otherwise(
                (F.col("score") - F.min("score").over(wq))
                / (F.max("score").over(wq) - F.min("score").over(wq))
            )
            .alias("c"),
        )
        tagged = contrib if tagged is None else tagged.unionByName(contrib)
    fused = tagged.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("combsum"), F.count(F.lit(1)).alias("n_retrievers")
    )
    fused = fused.withColumn(
        "combmnz", F.col("combsum") * F.col("n_retrievers")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("combmnz"), round_digits).desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.round("combsum", round_digits).alias("combsum"),
            F.round("combmnz", round_digits).alias("combmnz"),
            "n_retrievers",
        )
    )


def cross_fields(
    fields_df: DataFrame,
    queries: DataFrame,
    field_cols: list[str],
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = 4,
) -> DataFrame:
    """``multi_match`` type=cross_fields: treat ``field_cols`` as one
    logical field.  Term-centric scoring per Lucene BlendedTermQuery:

    * blended df(t) = max over fields of df_field(t)
    * score(q, d)  = Σ_t  idf_blend(t) * max over fields of
                     tf-norm_field(t, d)   (field-local dl and avgdl)

    so a term need only appear in SOME field, and a doc that splits the
    query terms across fields (first/last name across title/body) still
    ranks — the failure mode best_fields/dis_max has.

    ``fields_df`` carries doc_id + the raw string columns."""
    cfg = config or AnalyzerConfig()
    per_field = None
    for fc in field_cols:
        toks = tokens_df(
            fields_df.select("doc_id", F.col(fc).alias("text")), cfg
        ).select("doc_id", "term")
        p = (
            toks.groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("field", F.lit(fc))
        )
        dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        p = p.join(dl, "doc_id")
        per_field = p if per_field is None else per_field.unionByName(p)

    # field-local avgdl over ALL docs of that field (docs with zero terms
    # in a field still count toward its avgdl via the doc roster)
    n_docs = fields_df.select("doc_id").distinct().count()
    field_avg = (
        per_field.groupBy("field", "doc_id")
        .agg(F.max("dl").alias("dl"))
        .groupBy("field")
        .agg((F.sum("dl") / F.lit(float(n_docs))).alias("avgdl"))
    )
    blended_df = per_field.groupBy("term", "field").agg(
        F.count(F.lit(1)).alias("df_f")
    ).groupBy("term").agg(F.max("df_f").alias("df"))

    q_terms = analyze_queries(queries, cfg)
    scored = (
        F.broadcast(q_terms)
        .join(per_field, "term")
        .join(F.broadcast(field_avg), "field")
        .join(F.broadcast(blended_df), "term")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .withColumn(
            "norm",
            (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("query_id", "doc_id", "term")
        .agg(F.max(F.col("norm") * F.col("idf")).alias("t_score"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("t_score").alias("score"))
    )
    return _topk_window(scored, k, round_digits)


def borda_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Borda-fuse metasearch (Aslam & Montague, "Models for
    Metasearch", SIGIR 2001, §3.1): each retriever is a voter ranking
    the per-query candidate union of size n; a doc at rank p gets
    n - p + 1 points, and the docs a voter did NOT rank share its
    remaining points equally — (n - w_r + 1) / 2 each, where w_r is
    the number of docs that voter ranked for the query (the paper's
    "remaining candidates share the leftover points evenly" rule,
    which is what makes Borda-fuse a positional social-welfare
    function rather than an arbitrary 0-fill).

    Inputs carry (query_id, rank, doc_id); output (query_id, rank,
    doc_id, borda) ranked by (points desc, doc_id asc).

    Scale shape: same as rrf_fuse — inputs are rank-window-truncated,
    so the candidate union, the per-voter left joins, and the fusion
    aggregate are all |queries| x w x voters rows, never corpus-sized.
    """
    cand = None
    for r in rankings:
        c = r.select("query_id", "doc_id")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()
    n_cand = cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))

    total = None
    for r in rankings:
        w_r = r.groupBy("query_id").agg(F.count(F.lit(1)).alias("w"))
        contrib = (
            cand.join(n_cand, "query_id")
            .join(w_r, "query_id")
            .join(
                r.select("query_id", "doc_id", "rank"),
                ["query_id", "doc_id"],
                "left",
            )
            .select(
                "query_id",
                "doc_id",
                F.coalesce(
                    F.col("n") - F.col("rank") + 1,
                    (F.col("n") - F.col("w") + 1) / 2.0,
                ).alias("pts"),
            )
        )
        total = contrib if total is None else total.unionByName(contrib)

    fused = total.groupBy("query_id", "doc_id").agg(
        F.sum("pts").alias("borda")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("borda", round_digits).desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round("borda", round_digits).alias("borda"),
        )
    )


def merge_normalization_audit(
    docs: DataFrame,
    queries: DataFrame,
    n_shards: int = 4,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Federated result-merging score normalization A/B — min-max vs
    z-score vs raw-score merge against the single-index truth.

    The result-merging problem of federated search (Callan, DIR
    chapter 2000; Si & Callan's SSL refinements): shards score with
    LOCAL statistics, so their score scales differ and naive merging
    by raw score is biased toward shards with inflated idf.  The two
    classical repairs are per-shard MIN-MAX rescaling to [0,1] and
    per-shard Z-SCORE standardization.  This audit shards the corpus
    (keyed md5 routing), scores each shard with shard-local idf,
    merges under each normalization, and reports top-k agreement with
    the global single-index ranking:

        (query_id, scheme, topk_overlap, top1_match)

    Scale shape: one scoring join per shard-set (shard id is just a
    column — ONE join total), per-(query, shard) normalization
    windows, one global rank per scheme.
    """
    from pyspark.sql import Window

    from tokenkit_spark.index.routing import route_shard_col

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    ).withColumn("shard", route_shard_col("doc_id", n_shards))
    # global truth
    nd = docs.select(id_col).distinct().count()
    gdf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).distinct()
    g_scored = (
        qterms.join(tf, "term")
        .join(gdf, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(1.0 + F.col("tf"))
                * F.log(F.lit(float(nd)) / F.col("df"))
            ).alias("s")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    )
    g_top = g_scored.withColumn("rank", F.row_number().over(wq)).filter(
        F.col("rank") <= k
    ).select(
        "query_id", F.col("doc_id").alias("g_doc"),
        F.col("rank").alias("g_rank"),
    )
    # shard-local scoring
    sdocs = tf.select("shard", "doc_id").distinct().groupBy(
        "shard"
    ).agg(F.count(F.lit(1)).alias("s_nd"))
    sdf = tf.groupBy("shard", "term").agg(
        F.count(F.lit(1)).alias("s_df")
    )
    s_scored = (
        qterms.join(tf, "term")
        .join(sdf, ["shard", "term"])
        .join(F.broadcast(sdocs), "shard")
        .groupBy("query_id", "shard", "doc_id")
        .agg(
            F.sum(
                F.log(1.0 + F.col("tf"))
                * F.log(F.col("s_nd") / F.col("s_df").cast("double"))
            ).alias("s")
        )
    )
    wsh = Window.partitionBy("query_id", "shard")
    stats = (
        s_scored.withColumn("mn", F.min("s").over(wsh))
        .withColumn("mx", F.max("s").over(wsh))
        .withColumn("avg", F.avg("s").over(wsh))
        .withColumn(
            "sd",
            F.sqrt(
                F.greatest(
                    F.avg(F.col("s") * F.col("s")).over(wsh)
                    - F.avg("s").over(wsh) * F.avg("s").over(wsh),
                    F.lit(0.0),
                )
            ),
        )
    )
    schemes = {
        "raw": F.col("s"),
        "minmax": F.when(
            F.col("mx") != F.col("mn"),
            (F.col("s") - F.col("mn")) / (F.col("mx") - F.col("mn")),
        ).otherwise(F.lit(0.5)),
        "zscore": F.when(
            F.col("sd") > 0, (F.col("s") - F.col("avg")) / F.col("sd")
        ).otherwise(F.lit(0.0)),
    }
    out = None
    for name, expr in schemes.items():
        merged = stats.withColumn("ns", expr)
        wm = Window.partitionBy("query_id").orderBy(
            F.round("ns", 6).desc(), F.col("doc_id").asc()
        )
        m_top = merged.withColumn(
            "rank", F.row_number().over(wm)
        ).filter(F.col("rank") <= k)
        cmp = (
            m_top.join(
                g_top,
                (m_top.query_id == g_top.query_id)
                & (m_top.doc_id == F.col("g_doc")),
                "left",
            )
            .groupBy(m_top.query_id)
            .agg(
                F.sum(F.col("g_rank").isNotNull().cast("long")).alias(
                    "topk_overlap"
                ),
                F.max(
                    (
                        (F.col("rank") == 1) & (F.col("g_rank") == 1)
                    ).cast("long")
                ).alias("top1_match"),
            )
            .select(
                "query_id",
                F.lit(name).alias("scheme"),
                "topk_overlap",
                "top1_match",
            )
        )
        out = cmp if out is None else out.unionByName(cmp)
    return out
