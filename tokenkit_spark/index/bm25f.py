"""Field-weighted ranking models beyond plain BM25, relationally:

* **BM25F** (Robertson & Zaragoza, "The Probabilistic Relevance
  Framework: BM25 and Beyond", 2009): per-field weighted, per-field
  length-normalized pseudo-tf folded through ONE saturation —
  structurally different from most_fields (which saturates per field
  and sums):

      tf̃(t,d) = Σ_f  w_f · tf_f(t,d) / (1 - b_f + b_f · dl_f/avgdl_f)
      score   = Σ_t  idf(t) · tf̃ / (k1 + tf̃)

  idf uses whole-document df (the term occurs in ANY field).

* **SynonymQuery semantics** (Lucene, what ES query-time
  synonym_graph produces): all variants of a term score as one
  pseudo-term — tf = Σ variant tfs in the doc, df = MAX variant df —
  so a rare synonym never gets an outsized idf next to its common
  sibling.

Both are pure Catalyst plans over the tokenized relation: per-field
aggregates are (doc, term)-keyed with map-side partials; global stats
(avgdl_f, N) are one-row broadcasts; the only window is the per-query
top-k cut. No kernels, no driver state — the 10^12-doc shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("term"),
    )


def _topk(scored: DataFrame, k: int, round_digits: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), round_digits).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round("score", round_digits).alias("score"),
        )
    )


def bm25f(
    docs: DataFrame,
    queries: DataFrame,
    fields: dict[str, tuple[float, float]],
    k1: float = 1.2,
    k: int = 10,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """``fields``: {field_col: (weight, b)}. ``queries``: (query_id,
    text), whitespace-lowercase analyzed. Returns (query_id, rank,
    doc_id, score) top-k per query."""
    weighted = None
    any_field = None
    for fld, (wt, b) in fields.items():
        toks = _toks(docs, id_col, fld)
        tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
        dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
        avg = dl.agg(F.avg("dl").alias("avgdl"))
        norm = (
            tf.join(dl, id_col)
            .crossJoin(F.broadcast(avg))
            .select(
                id_col,
                "term",
                (
                    F.lit(float(wt)) * F.col("tf")
                    / (F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
                ).alias("wtf"),
            )
        )
        weighted = norm if weighted is None else weighted.unionByName(norm)
        any_field = (
            tf.select(id_col, "term")
            if any_field is None
            else any_field.unionByName(tf.select(id_col, "term"))
        )
    pseudo = weighted.groupBy(id_col, "term").agg(F.sum("wtf").alias("ptf"))
    df_t = any_field.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
            )
        ).alias("term"),
    )
    scored = (
        qterms.join(pseudo, "term")
        .join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("query_id", id_col)
        .agg(
            F.sum(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("ptf")
                / (F.lit(float(k1)) + F.col("ptf"))
            ).alias("score")
        )
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)


def synonym_search(
    docs: DataFrame,
    queries: DataFrame,
    synonyms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Query-time synonym expansion with Lucene SynonymQuery scoring:
    each analyzed query term and its variants from ``synonyms``
    (term, variant) form one pseudo-term — tf sums over variants in the
    doc, df is the MAX variant df. BM25(k1, b) over pseudo-terms."""
    toks = _toks(docs, id_col, text_col)
    postings = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
            )
        ).alias("term"),
    )
    # identity variant + synonym table variants
    variants = qterms.select("query_id", "term", F.col("term").alias("variant")).unionByName(
        qterms.join(synonyms, "term").select("query_id", "term", "variant")
    ).distinct()
    # pseudo-df: max df over variants that exist in the corpus
    vdf = (
        variants.join(df_t.withColumnRenamed("term", "variant"), "variant", "left")
        .groupBy("query_id", "term")
        .agg(F.max(F.coalesce("df", F.lit(0))).alias("df_syn"))
    )
    # pseudo-tf per doc: sum of variant tfs
    vtf = (
        variants.join(
            postings.withColumnRenamed("term", "variant"), "variant"
        )
        .groupBy("query_id", "term", id_col)
        .agg(F.sum("tf").alias("tf_syn"))
    )
    scored = (
        vtf.join(vdf, ["query_id", "term"])
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(
            F.sum(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df_syn") + 0.5)
                    / (F.col("df_syn") + 0.5)
                )
                * F.col("tf_syn") * (k1 + 1.0)
                / (
                    F.col("tf_syn")
                    + F.lit(float(k1))
                    * (1.0 - b + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)


def bm25_plus(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    delta: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """BM25+ (Lv & Zhai, "Lower-Bounding Term Frequency Normalization",
    CIKM 2011): plain BM25 penalizes very long documents so hard that a
    long doc CONTAINING a query term can score below a short doc
    without it; BM25+ adds a per-matched-term floor ``delta``:

        score = Σ_t idf(t) · [ tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
                               + δ ]

    so any occurrence is worth at least idf·δ regardless of dl. Same
    relational plan as the plain pipeline; δ=0 degrades to BM25
    exactly (asserted in tests)."""
    toks = _toks(docs, id_col, text_col)
    postings = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
            )
        ).alias("term"),
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (1.0 - b + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        qterms.join(postings, "term")
        .join(df_t, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(F.sum(idf * (sat + F.lit(float(delta)))).alias("score"))
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)


def combined_fields(
    docs: DataFrame,
    queries: DataFrame,
    fields: dict[str, float],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """ES ``combined_fields`` query (Lucene ``CombinedFieldQuery``;
    Robertson, Zaragoza & Taylor, "Simple BM25 extension to multiple
    weighted fields", CIKM 2004 — the BM25F simplification with one
    shared ``b``): term-centric scoring over a synthetic merged field,

        tf*(t,d) = Σ_f w_f · tf_f(t,d)
        dl*(d)   = Σ_f w_f · dl_f(d)        avgdl* = avg_d dl*(d)
        df(t)    = |{d : t in ANY field}|

    then plain BM25 saturation over (tf*, dl*, avgdl*).  Unlike
    most_fields (per-field saturation summed) or dis_max (max), the
    merged statistics make idf consistent across fields — the
    structured-document contract.  ``fields``: {field_col: weight}.

    Same relational shape as bm25f: per-field tf/dl aggregates union
    into one weighted relation, globals broadcast, top-k window."""
    wtf = None
    wdl = None
    for fld, wt in fields.items():
        toks = _toks(docs, id_col, fld)
        tf = toks.groupBy(id_col, "term").agg(
            (F.count("*") * float(wt)).alias("wtf")
        )
        dl = toks.groupBy(id_col).agg(
            (F.count("*") * float(wt)).alias("wdl")
        )
        wtf = tf if wtf is None else wtf.unionByName(tf)
        wdl = dl if wdl is None else wdl.unionByName(dl)
    postings = wtf.groupBy(id_col, "term").agg(F.sum("wtf").alias("tf"))
    dstats = wdl.groupBy(id_col).agg(F.sum("wdl").alias("dl"))
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("term"),
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (1.0 - b + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        qterms.join(postings, "term")
        .join(df_t, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(F.sum(idf * sat).alias("score"))
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)


def bm25_l(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    delta: float = 0.5,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """BM25L (Lv & Zhai, "When Documents Are Very Long, BM25 Fails!",
    CIKM 2011 poster): instead of adding a raw floor to the saturation
    (BM25+, above), BM25L normalizes tf FIRST and shifts the
    normalized value, fixing the same very-long-document penalty with
    a different saturation shape:

        c'(t,d) = tf / (1 - b + b·dl/avgdl)
        score   = Σ_t idf_L(t) · (k1+1)·(c'+δ) / (k1 + c'+δ)

    with the paper's idf_L(t) = ln((N+1)/(df+0.5)) and δ=0.5.  Only
    matched terms contribute (c' > 0 by construction on the join).
    Identical relational plan to BM25+ — one (doc, term) tf aggregate,
    per-doc dl, per-term df, broadcast one-row globals, per-query
    top-k window; no UDFs, everything map-side-combinable."""
    toks = _toks(docs, id_col, text_col)
    postings = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    globals_ = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("term"),
    )
    idf_l = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 0.5))
    ctd = F.col("tf") / (
        1.0 - b + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
    )
    shifted = ctd + F.lit(float(delta))
    sat = (k1 + 1.0) * shifted / (F.lit(float(k1)) + shifted)
    scored = (
        qterms.join(postings, "term")
        .join(df_t, "term")
        .join(dstats, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy("query_id", id_col)
        .agg(F.sum(idf_l * sat).alias("score"))
        .withColumnRenamed(id_col, "doc_id")
    )
    return _topk(scored, k, round_digits)
