"""BM25 top-k query engine.

Scoring (north_rule constants k1=1.2, b=0.75):

    score(q, d) = Σ_{t ∈ distinct(analyze(q))}  idf(t) * norm(t, d)
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))      (Lucene/Robertson)
    norm(t, d)  = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Total order pinned for rank identity: (score desc, doc_id asc).

Two execution paths, asserted equal by tests:

* ``bm25_brute``   — pure DataFrame algebra over uncompressed postings
                     (SQL-expressible: this is the DuckDB oracle twin).
* ``bm25_segments``— document-partitioned search over the compressed index:
                     query terms are BROADCAST-joined against segments
                     (term_bucket + term pushdown prunes the scan), each
                     doc-shard scores its matched posting blobs with numpy
                     (decode -> idf*norm -> accumulate by doc), emits its
                     local top-k, and a global top-k merge finishes. No
                     shuffle ever moves a posting list; only (shard-local
                     top-k rows) cross the wire.

Query analysis reuses the INDEX analyzer config (index-time / query-time
parity — the contract the reference documents in README.md:512-541).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import AnalyzerConfig
from ..functions.udfs import tokenize_col
from . import codec, wand
from .build import postings_df, doc_stats_df, shard_col, term_bucket_col

K1 = codec.K1
B = codec.B


def analyze_queries(queries: DataFrame, config: AnalyzerConfig) -> DataFrame:
    """(query_id, text) -> (query_id, term) with distinct terms per query."""
    return queries.select(
        "query_id",
        F.explode(F.array_distinct(tokenize_col("text", config))).alias("term"),
    )


def _idf(df_col, n_docs: int):
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def _topk_window(scored: DataFrame, k: int, round_digits: int | None = None) -> DataFrame:
    """Global top-k with the pinned total order (score desc, doc_id asc).
    round_digits: rank on ROUNDED scores — used when results are compared
    against an external engine (e.g. the DuckDB oracle) so float summation
    order can't flip near-ties."""
    score = (
        F.round(F.col("score"), round_digits) if round_digits is not None else F.col("score")
    )
    w = Window.partitionBy("query_id").orderBy(score.desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", score.alias("score"))
    )


def bm25_brute(
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Brute-force BM25 straight from docs(doc_id, text): the correctness
    oracle path, all Catalyst built-ins."""
    cfg = config or AnalyzerConfig()
    postings = postings_df(docs, cfg).select("term", "doc_id", "tf")
    dstats = doc_stats_df(docs, cfg)
    n_docs, avgdl = _doc_globals(dstats)
    term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q_terms = analyze_queries(queries, cfg)

    scored = (
        F.broadcast(q_terms)
        .join(postings, "term")
        .join(term_stats, "term")
        .join(dstats, "doc_id")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .withColumn(
            "norm",
            (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("idf") * F.col("norm")).alias("score"))
    )
    return _topk_window(scored, k, round_digits)


def bm25_explain(
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Lucene-Explanation-style score breakdown: one row per (query,
    top-k doc, matched term) carrying the BM25 components — tf, df,
    idf, length-normalized tf, and the term's contribution — plus the
    doc's total score and rank. The reference exposes only final scores
    (k1=1.2, b=0.75 per the north rule); this is the debuggability
    surface every search engine grows.

    Scale shape: the same joins as ``bm25_brute``; the component
    relation is then re-joined to the top-k winner ids (k·|Q| rows —
    broadcastable), so the full breakdown never materializes beyond
    the winners."""
    cfg = config or AnalyzerConfig()
    postings = postings_df(docs, cfg).select("term", "doc_id", "tf")
    dstats = doc_stats_df(docs, cfg)
    n_docs, avgdl = _doc_globals(dstats)
    term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q_terms = analyze_queries(queries, cfg)

    per_term = (
        F.broadcast(q_terms)
        .join(postings, "term")
        .join(term_stats, "term")
        .join(dstats, "doc_id")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .withColumn(
            "norm",
            (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .withColumn("term_score", F.col("idf") * F.col("norm"))
    )
    totals = per_term.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )
    topk = _topk_window(totals, k, round_digits)
    return (
        F.broadcast(topk)
        .join(per_term, ["query_id", "doc_id"])
        .select(
            "query_id", "rank", "doc_id", "score", "term", "tf", "df",
            F.round("idf", 6).alias("idf"),
            F.round("norm", 6).alias("tf_norm"),
            F.round("term_score", 6).alias("term_score"),
        )
    )


def rescore_phrase(
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    window: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    round_digits: int = 4,
) -> DataFrame:
    """ES rescore API: retrieve the top-``window`` docs per query by
    BM25, then rescore ONLY that window with a secondary exact-phrase
    signal (occurrences of the full analyzed query token sequence) and
    re-rank on ``query_weight*bm25 + rescore_weight*phrase_tf``. The
    expensive positional check runs on window·|Q| rows, never the match
    set — exactly why the rescore pattern exists.

    Output: (query_id, rank, doc_id, bm25, phrase_tf, final), top-k by
    (rounded final desc, doc_id asc)."""
    cfg = config or AnalyzerConfig()
    primary = bm25_brute(docs, queries, cfg, k=window, round_digits=round_digits)
    qtok = queries.select("query_id", tokenize_col("text", cfg).alias("p"))
    dtok = docs.select("doc_id", tokenize_col("text", cfg).alias("t"))
    joined = (
        primary.withColumnRenamed("score", "bm25")
        .join(F.broadcast(qtok), "query_id")
        .join(dtok, "doc_id")
    )
    np_ = F.size("p")
    # count sliding-window matches of the phrase; sequence(1, 0) counts
    # DOWN in Spark, so guard docs shorter than the phrase
    cnt = F.when(
        (np_ > 0) & (F.size("t") >= np_),
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size("t") - np_ + 1),
                lambda i: F.slice("t", i, np_) == F.col("p"),
            )
        ),
    ).otherwise(F.lit(0))
    scored = joined.withColumn("phrase_tf", cnt.cast("long")).withColumn(
        "final",
        F.round(
            F.lit(query_weight) * F.col("bm25")
            + F.lit(rescore_weight) * F.col("phrase_tf"),
            round_digits,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("final").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "bm25", "phrase_tf", "final")
    )


_SIG_HEURISTICS = ("jlh", "chi_square", "mutual_information", "gnd")


def significant_terms(
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    n: int = 5,
    heuristic: str = "jlh",
) -> DataFrame:
    """ES significant_terms aggregation: terms whose frequency in each
    query's MATCH SET (foreground) most exceeds their corpus (background)
    frequency. ``heuristic`` picks the ES scoring function:

    * ``jlh`` (default) — ``(fg% - bg%) * (fg% / bg%)``; output column
      ``jlh``, top-``n`` by (6-dp jlh desc, term asc).
    * ``chi_square`` — Pearson chi^2 on the 2x2 term/match-set
      contingency table, the formula ES cites from Manning et al.,
      "Introduction to Information Retrieval" ch. 13.5.2, with ES's
      ``background_is_superset=true`` adjustment (the foreground is
      subtracted out of the background cells). Column ``score`` desc.
    * ``mutual_information`` — MI of the same 2x2 table (Manning et al.
      eq. 13.17, the reference ES documents), 0*log2(0) = 0, with the
      background-superset adjustment. Column ``score`` desc.
    * ``gnd`` — Google Normalized Distance (Cilibrasi & Vitanyi 2007,
      the paper ES cites): smaller = more related, so top-``n`` ranks
      ASCENDING on the ``score`` column.

    Scale shape: the match set is a distinct (query, doc) semi-join; the
    foreground count re-joins it to postings keyed on doc_id (the big
    join — partial aggs flatten term skew); background stats are one
    corpus-keyed agg reused across queries; every heuristic is pure
    column arithmetic over the joined (query, term) counts. Everything
    relational, no driver state."""
    if heuristic not in _SIG_HEURISTICS:
        raise ValueError(f"significant_terms: unknown heuristic {heuristic!r}")
    cfg = config or AnalyzerConfig()
    postings = postings_df(docs, cfg).select("term", "doc_id").distinct()
    # corpus size stays IN the plan (one-row broadcast) — no eager
    # count that would run the tokenize lineage twice
    ndocs_df = docs.agg(F.count_distinct("doc_id").alias("_n_docs"))
    bg = postings.groupBy("term").agg(F.count(F.lit(1)).alias("bg_df"))
    q_terms = analyze_queries(queries, cfg)

    match_docs = (
        F.broadcast(q_terms)
        .join(postings, "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    fg_size = match_docs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("fg_size")
    )
    fg = (
        match_docs.join(postings, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
    )
    counts = fg.join(fg_size, "query_id").join(bg, "term").crossJoin(
        F.broadcast(ndocs_df)
    )
    if heuristic == "jlh":
        scored = (
            counts.withColumn("fg_pct", F.col("fg_df") / F.col("fg_size"))
            .withColumn("bg_pct", F.col("bg_df") / F.col("_n_docs"))
            .withColumn(
                "jlh",
                F.round(
                    (F.col("fg_pct") - F.col("bg_pct"))
                    * (F.col("fg_pct") / F.col("bg_pct")),
                    6,
                ),
            )
        )
        score_col, ascending = "jlh", False
    else:
        # 2x2 contingency with ES background_is_superset=true: the match
        # set is subtracted out of the background cells.
        n11 = F.col("fg_df").cast("double")
        n10 = (F.col("fg_size") - F.col("fg_df")).cast("double")
        n01 = (F.col("bg_df") - F.col("fg_df")).cast("double")
        n00 = (
            F.col("_n_docs") - F.col("bg_df")
            - (F.col("fg_size") - F.col("fg_df"))
        ).cast("double")
        nn = F.col("_n_docs").cast("double")
        if heuristic == "chi_square":
            num = nn * F.pow(n11 * n00 - n10 * n01, F.lit(2.0))
            den = (
                (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
            )
            scored = counts.withColumn(
                "score",
                F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6),
            )
        elif heuristic == "mutual_information":
            def mi_cell(nxy, nx_, n_y):
                return F.when(
                    nxy > 0,
                    (nxy / nn) * F.log2(nn * nxy / (nx_ * n_y)),
                ).otherwise(F.lit(0.0))

            n1_, n0_ = n11 + n10, n01 + n00
            n_1, n_0 = n11 + n01, n10 + n00
            scored = counts.withColumn(
                "score",
                F.round(
                    mi_cell(n11, n1_, n_1)
                    + mi_cell(n10, n1_, n_0)
                    + mi_cell(n01, n0_, n_1)
                    + mi_cell(n00, n0_, n_0),
                    6,
                ),
            )
        else:  # gnd — a DISTANCE: smaller is more related
            fx, fy, fxy = n11 + n10, n11 + n01, n11
            den = F.log(nn) - F.least(F.log(fx), F.log(fy))
            scored = counts.withColumn(
                "score",
                F.round(
                    F.when(
                        den > 0,
                        (F.greatest(F.log(fx), F.log(fy)) - F.log(fxy)) / den,
                    ).otherwise(F.lit(0.0)),  # a set spanning the corpus: distance 0
                    6,
                ),
            )
        score_col, ascending = "score", heuristic == "gnd"
    order = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.partitionBy("query_id").orderBy(order, F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
        .select(
            "query_id", "rank", "term", "fg_df", "fg_size", "bg_df", score_col
        )
    )


def _doc_globals(dstats: DataFrame) -> tuple[int, float]:
    row = dstats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row.n), float(row.avgdl)


_TERM_COLS = [
    "idf", "n_postings", "doc_ids_blob", "tfs_blob", "dls_blob",
    "block_last", "block_max_tf", "block_min_dl",
    "block_doc_off", "block_tf_off", "block_dl_off", "codec",
]


DIRECT_MAX_BLOCKS = 16  # <= this many total blocks: skip WAND bookkeeping


def _shard_partitions(spark: SparkSession, n_shards: int) -> int:
    """Partition count for the per-shard scoring shuffle. With the
    default (spark.sql.shuffle.partitions ~ 2x cores) and n_shards of
    the same order, hash collisions stack several shard groups on one
    task and the stage becomes straggler-bound — measured 8-core query
    throughput varied 12-31 q/s purely on task load. Many more buckets
    than shard keys (4x) makes collisions rare; empty partitions cost
    ~nothing, and task count stays the same at every cluster size (the
    work unit is the shard, not the core count)."""
    return max(spark.sparkContext.defaultParallelism * 2, n_shards * 4)


def _score_shard_kernel(
    k: int,
    n_docs: int,
    avgdl: float,
    use_blockmax: bool = True,
    direct_max_blocks: int = DIRECT_MAX_BLOCKS,
    pruning: str = "wand",
):
    """mapInPandas kernel over segment rows already joined with
    (query_id, idf): for each (query, doc-shard) group, run the exact
    Block-Max WAND pass (wand.score_query_shard — rarest term first,
    threshold from the running top-k, pruned blocks never decoded) and
    emit the group's top-k candidates. Only (shard-local top-k) rows ever
    cross the wire; posting lists don't.

    Groups whose lists total <= direct_max_blocks blocks take the
    exhaustive memoized path instead (wand.score_query_direct): with
    nothing to prune, WAND's per-query threshold bookkeeping is pure
    overhead — this is what makes the 10^4+-query batch regime cheap on
    short lists while huge lists still get pruning. Results identical.

    ``pruning`` selects the dynamic-pruning operator for long lists:
    "wand" (block-max WAND, wand.py) or "maxscore" (block-max MAXSCORE,
    maxscore.py) — both exact, same tie order, different skip
    strategies (block-threshold vs essential/non-essential lists)."""
    if pruning == "maxscore":
        from . import maxscore as _ms

        prune_fn = _ms.score_query_maxscore
    else:
        prune_fn = wand.score_query_shard

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # gather term rows per (query, shard) across this partition's
        # batches; a term row arrives ONCE per shard and is shared (by
        # reference) among all queries that contain the term
        groups: dict[tuple[int, int], list[dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {c: getattr(row, c) for c in _TERM_COLS}
                for q in row.query_ids:
                    groups.setdefault((int(q), int(row.shard)), []).append(t)
        out_q, out_d, out_s = [], [], []
        for (q, _shard), terms in groups.items():
            # adaptive cutover: WAND needs (a) enough blocks for skips
            # to matter AND (b) postings >> k — when the whole candidate
            # set is about the size of the answer, θ never rises enough
            # to prune and the bookkeeping is pure overhead
            n_blocks = sum(len(t["block_last"]) for t in terms)
            n_post = sum(int(t["n_postings"]) for t in terms)
            if use_blockmax and n_blocks > direct_max_blocks and n_post > 4 * k:
                res = prune_fn(terms, avgdl, k)
            else:  # short lists, or the A/B exhaustive fallback
                res = wand.score_query_direct(terms, avgdl, k)
            ids, scores = res["doc_ids"], res["scores"]
            out_q.extend([q] * len(ids))
            out_d.extend(np.asarray(ids).tolist())
            out_s.extend(np.asarray(scores).tolist())
        yield pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return fn


def bm25_segments(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
    use_blockmax: bool = True,
    direct_max_blocks: int = DIRECT_MAX_BLOCKS,
    pruning: str = "wand",
) -> DataFrame:
    """Top-k BM25 over the compressed doc-sharded index (see module doc)."""
    cfg = config or AnalyzerConfig()
    q_terms = analyze_queries(queries, cfg)
    return _bm25_from_qterms(
        spark, index, q_terms, k, round_digits, use_blockmax, direct_max_blocks,
        pruning,
    )


def _matched_terms(spark: SparkSession, index: dict, q_terms: DataFrame) -> DataFrame | None:
    """Matched (term, shard) segment rows for a query-term set, joined
    with per-term query lists and idf — the shared scan side of every
    segment scoring path. None when the analyzed term set is empty.

    Driver-side term list: queries are small by definition; it lets us
    push term/bucket predicates INTO the parquet scan (partition +
    rowgroup prune). One row per matched (term, shard) — NOT per
    (query, term, shard): queries sharing a head term would otherwise
    each ship a duplicate copy of its posting blobs through the shuffle
    and Arrow boundary."""
    stats = index["stats"]
    n_docs = int(stats["n_docs"])
    n_buckets = int(stats["n_buckets"])
    terms = [r.term for r in q_terms.select("term").distinct().collect()]
    if not terms:
        return None
    buckets = list({b.term_bucket for b in
                    spark.createDataFrame([(t,) for t in terms], "term string")
                    .select(term_bucket_col(F.col("term"), n_buckets).alias("term_bucket"))
                    .collect()})

    seg = (
        index["segments"]
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    tstats = index["term_stats"].filter(F.col("term").isin(terms))
    q_term_lists = q_terms.groupBy("term").agg(
        F.collect_list("query_id").alias("query_ids")
    )
    return (
        seg.join(F.broadcast(q_term_lists), "term")
        .join(F.broadcast(tstats), "term")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .select("query_ids", "shard", *_TERM_COLS)
    )


def _bm25_from_qterms(
    spark: SparkSession,
    index: dict,
    q_terms: DataFrame,
    k: int = 10,
    round_digits: int | None = None,
    use_blockmax: bool = True,
    direct_max_blocks: int = DIRECT_MAX_BLOCKS,
    pruning: str = "wand",
) -> DataFrame:
    """Core of bm25_segments over a pre-analyzed / pre-expanded
    (query_id, term) set — shared by the plain, fuzzy, prefix, and
    wildcard query paths (expansion happens upstream; scoring is
    identical: every expanded term contributes its own idf*norm)."""
    stats = index["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    n_shards = int(stats["n_shards"])
    matched = _matched_terms(spark, index, q_terms)
    if matched is None:
        return spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")

    out_schema = "query_id long, doc_id long, score double"
    # The index is DOC-sharded, so per-shard top-k under the raw total
    # order (score desc, doc_id asc) makes the global top-k exact with NO
    # margin. Only when ranking on ROUNDED scores can a raw-score local
    # cut starve a rounded-score global tie — over-fetch a margin then.
    k_local = k + 32 if round_digits is not None else k
    candidates = (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(
            _score_shard_kernel(
                k_local, n_docs, avgdl, use_blockmax, direct_max_blocks, pruning
            ),
            out_schema,
        )
    )
    return _topk_window(candidates, k, round_digits)


def _deletion_variants(col: str):
    """All single-character deletions of string column ``col`` plus the
    string itself, as a deduplicated array. Pure Catalyst (array lambda,
    no UDF) — this is the SymSpell trick: two strings are within
    Levenshtein distance 1 iff their deletion neighbourhoods intersect,
    so an equi-join on variants replaces the quadratic distance scan."""
    return F.expr(
        f"array_union(array({col}), transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), "
        f"substring({col}, i + 1, length({col})))))"
    )


def fuzzy_expand_terms(
    index: dict,
    q_terms: DataFrame,
    max_dist: int = 1,
    max_expansions: int = 50,
) -> DataFrame:
    """(query_id, term) -> (query_id, term) with each query term replaced
    by every dictionary term within Levenshtein distance ``max_dist``.

    Scale path: the term dictionary stays DISTRIBUTED — its deletion
    variants are a narrow generated column; the (tiny) query variant set
    broadcasts, the equi-join on variant prunes to candidates, and only
    candidates pay the exact ``levenshtein`` verify (JVM built-in). No
    cross join, no UDF. Per (query, term), expansions are capped at
    ``max_expansions`` highest-df dictionary terms (ties by term) — the
    Lucene FuzzyQuery safety valve against head-of-dictionary blowups."""
    if max_dist != 1:
        raise ValueError(
            "fuzzy_expand_terms: only max_dist=1 is supported (the "
            "depth-1 deletion neighbourhood is complete only for d<=1)"
        )
    qv = (
        q_terms.select("query_id", F.col("term").alias("qterm"))
        .distinct()
        .select(
            "query_id", "qterm",
            F.explode(_deletion_variants("qterm")).alias("variant"),
        )
    )
    dv = index["term_stats"].select(
        "term", "df", F.explode(_deletion_variants("term")).alias("variant")
    )
    cand = (
        dv.join(F.broadcast(qv), "variant")
        .select("query_id", "qterm", "term", "df")
        .distinct()
        .filter(F.levenshtein(F.col("qterm"), F.col("term")) <= max_dist)
    )
    w = Window.partitionBy("query_id", "qterm").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_expansions)
        .select("query_id", "term")
        .distinct()
    )


def bm25_segments_fuzzy(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    max_dist: int = 1,
    max_expansions: int = 50,
    round_digits: int | None = None,
) -> DataFrame:
    """Fuzzy top-k BM25: every analyzed query term expands to the
    dictionary terms within edit distance ``max_dist`` (SymSpell
    deletion-neighbourhood join, see fuzzy_expand_terms), then the
    expanded term set scores through the plain segment path — each
    expanded term contributes its own idf*norm, ranks pinned
    (score desc, doc_id asc)."""
    cfg = config or AnalyzerConfig()
    expanded = fuzzy_expand_terms(
        index, analyze_queries(queries, cfg), max_dist, max_expansions
    )
    return _bm25_from_qterms(spark, index, expanded, k, round_digits)


def suggest_terms(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    n: int = 5,
    max_dist: int = 1,
) -> DataFrame:
    """Did-you-mean spelling suggester (Lucene DirectSpellChecker
    contract): for every analyzed query term, the dictionary terms at
    Levenshtein distance 1..``max_dist`` (never the term itself), ranked
    by (df desc, suggestion asc), top ``n`` per (query, term).

    Same scale shape as fuzzy_expand_terms: the term dictionary stays
    distributed, its deletion-neighbourhood variants equi-join against
    the broadcast query variants, and only candidates pay the exact
    JVM ``levenshtein`` — no cross join, no UDF, no dictionary collect.

    Returns (query_id, qterm, rank, suggestion, df, dist)."""
    if max_dist != 1:
        raise ValueError(
            "suggest_terms: only max_dist=1 is supported (deletion "
            "neighbourhood completeness, see fuzzy_expand_terms)"
        )
    cfg = config or AnalyzerConfig()
    q_terms = analyze_queries(queries, cfg)
    qv = (
        q_terms.select("query_id", F.col("term").alias("qterm"))
        .distinct()
        .select(
            "query_id", "qterm",
            F.explode(_deletion_variants("qterm")).alias("variant"),
        )
    )
    dv = index["term_stats"].select(
        "term", "df", F.explode(_deletion_variants("term")).alias("variant")
    )
    cand = (
        dv.join(F.broadcast(qv), "variant")
        .select("query_id", "qterm", F.col("term").alias("suggestion"), "df")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("qterm"), F.col("suggestion")))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
    )
    w = Window.partitionBy("query_id", "qterm").orderBy(
        F.col("df").desc(), F.col("suggestion").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("query_id", "qterm", "rank", "suggestion", "df", "dist")
    )


def complete_terms(
    spark: SparkSession,
    index: dict,
    prefixes: DataFrame,
    n: int = 5,
) -> DataFrame:
    """Completion suggester (ES completion/search-as-you-type contract):
    for each prefix (query_id, prefix), the top-``n`` dictionary terms
    starting with that prefix, weighted by corpus df (desc, term asc
    tiebreak).

    Scale shape: the prefixes are a user keystroke set (tiny) and
    broadcast into the DISTRIBUTED term dictionary via a startswith
    theta-join; only candidate rows reach the per-prefix rank window.
    ES serves this from a dedicated FST — here the dictionary is already
    a relation, so the same contract is a join + window, and at
    dictionary scale the prefix predicate prunes on the dictionary's
    term-ordered parquet row groups.

    Returns (query_id, prefix, rank, term, df)."""
    cand = index["term_stats"].select("term", "df").join(
        F.broadcast(prefixes.select("query_id", "prefix")),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("query_id", "prefix").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("query_id", "prefix", "rank", "term", "df")
    )


def more_like_this(
    spark: SparkSession,
    index: dict,
    seeds: DataFrame,
    config: AnalyzerConfig | None = None,
    max_query_terms: int = 10,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Lucene MoreLikeThis contract: for each seed doc (doc_id, text),
    re-analyze its text, rank its terms by tf * idf (same BM25 idf as
    scoring; ranked on the 6-dp-rounded product so an external oracle
    can reproduce the cut, ties term asc), keep the top
    ``max_query_terms`` "interesting terms", and run them as a
    disjunctive BM25 query — excluding the seed document itself from
    the top-``k``. query_id = seed doc_id in the output.

    Scale shape: seeds are a user query (small) — their (term, tf) set
    broadcasts into the DISTRIBUTED term dictionary for df lookup; the
    scoring pass is the shared segment path (term-pruned scan, shard-
    local kernels, only top-k rows shuffle)."""
    cfg = config or AnalyzerConfig()
    n_docs = int(index["stats"]["n_docs"])
    tf = (
        seeds.select(
            F.col("doc_id").alias("query_id"),
            F.explode(tokenize_col("text", cfg)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    interest = F.round(F.col("tf") * _idf(F.col("df"), n_docs), 6)
    w = Window.partitionBy("query_id").orderBy(
        interest.desc(), F.col("term").asc()
    )
    q_terms = (
        index["term_stats"]
        .join(F.broadcast(tf), "term")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_query_terms)
        .select("query_id", "term")
    )
    # over-fetch one slot so dropping the seed doc can't starve the top-k
    out = _bm25_from_qterms(spark, index, q_terms, k + 1, round_digits)
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        out.filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _filtered_shard_kernel(
    k: int,
    avgdl: float,
    use_blockmax: bool,
    direct_max_blocks: int,
):
    """Cogroup kernel for filtered search: one call per doc-shard with
    (matched term rows, eligible doc ids of THAT shard). Eligibility is
    applied inside the scoring kernels before the local top-k cut."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "doc_id": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64")}
        )
        if not len(left) or not len(right):
            return empty
        eligible = np.unique(right["doc_id"].to_numpy(np.int64))
        groups: dict[int, list[dict]] = {}
        for row in left.itertuples(index=False):
            t = {c: getattr(row, c) for c in _TERM_COLS}
            for q in row.query_ids:
                groups.setdefault(int(q), []).append(t)
        out_q, out_d, out_s = [], [], []
        for q, terms in groups.items():
            if use_blockmax and sum(len(t["block_last"]) for t in terms) > direct_max_blocks:
                res = wand.score_query_shard(terms, avgdl, k, eligible=eligible)
            else:
                res = wand.score_query_direct(terms, avgdl, k, eligible=eligible)
            ids, scores = res["doc_ids"], res["scores"]
            out_q.extend([q] * len(ids))
            out_d.extend(np.asarray(ids).tolist())
            out_s.extend(np.asarray(scores).tolist())
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return fn


def bm25_segments_filtered(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    eligible: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
    use_blockmax: bool = True,
    direct_max_blocks: int = DIRECT_MAX_BLOCKS,
) -> DataFrame:
    """Filtered top-k BM25 (the ES bool-query FILTER context): only docs
    in ``eligible`` (any DataFrame with a doc_id column — the result of
    an arbitrary relational predicate) may rank; scores are unchanged by
    the filter (filters don't score — the ES contract).

    Scale shape: the eligible set is computed ONCE, hashed to the SAME
    doc-shard key the index uses (pmod(xxhash64(doc_id), n_shards)), and
    cogrouped with the matched segment rows — each shard kernel sees
    exactly its shard's eligible ids (sorted array, searchsorted
    membership) and applies them BEFORE the shard-local top-k cut, so
    there is no over-fetch correctness hole no matter how selective the
    filter. WAND pruning stays safe (θ from eligible docs only is ≤ the
    unfiltered θ). The filter ids shuffle once, partitioned by shard —
    never through the driver."""
    cfg = config or AnalyzerConfig()
    q_terms = analyze_queries(queries, cfg)
    stats = index["stats"]
    avgdl = float(stats["avgdl"])
    n_shards = int(stats["n_shards"])
    matched = _matched_terms(spark, index, q_terms)
    if matched is None:
        return spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")
    elig = (
        eligible.select(F.col("doc_id").cast("long").alias("doc_id"))
        .distinct()
        .withColumn("shard", shard_col(F.col("doc_id"), n_shards))
    )
    candidates = (
        matched.groupby("shard")
        .cogroup(elig.groupby("shard"))
        .applyInPandas(
            _filtered_shard_kernel(k + 32, avgdl, use_blockmax, direct_max_blocks),
            "query_id long, doc_id long, score double",
        )
    )
    return _topk_window(candidates, k, round_digits)


def bm25_segments_prf(
    spark: SparkSession,
    index: dict,
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    round_digits: int | None = None,
) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio / RM3-lite): run the query,
    take its top ``fb_docs`` hits as assumed-relevant, extract their top
    ``fb_terms`` expansion terms by summed tf * idf (6-dp-rounded, ties
    term asc — same interesting-term rule as more_like_this), union with
    the original analyzed terms, and score the expanded disjunction.

    Scale shape: stage 1 is the ordinary segment path; the per-query hit
    set (<= fb_docs rows) broadcasts into ``docs`` to fetch feedback
    text (store-and-reanalyze, as snippets/more_like_this); expansion
    term selection broadcasts into the distributed dictionary; stage 2
    is the segment path again. No new kernel, no collect beyond the
    stage-boundary term lists queries already pay."""
    cfg = config or AnalyzerConfig()
    q_terms = analyze_queries(queries, cfg)
    first = _bm25_from_qterms(spark, index, q_terms, fb_docs, round_digits)
    hits = first.select("query_id", "doc_id")
    fb_toks = (
        docs.join(F.broadcast(hits), "doc_id")
        .select("query_id", F.explode(tokenize_col("text", cfg)).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = int(index["stats"]["n_docs"])
    interest = F.round(F.col("tf") * _idf(F.col("df"), n_docs), 6)
    w = Window.partitionBy("query_id").orderBy(
        interest.desc(), F.col("term").asc()
    )
    expansion = (
        index["term_stats"]
        .join(F.broadcast(fb_toks), "term")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= fb_terms)
        .select("query_id", "term")
    )
    expanded = q_terms.unionByName(expansion).distinct()
    return _bm25_from_qterms(spark, index, expanded, k, round_digits)


def _split_patterns(patterns: DataFrame) -> list[tuple[int, str]]:
    """Collect (query_id, pattern-token) pairs driver-side. Pattern SETS
    are small by definition (they are user queries); the expensive side —
    the term dictionary — never leaves the cluster."""
    out = []
    for r in patterns.select("query_id", "text").collect():
        for tok in str(r.text).lower().split():
            out.append((int(r.query_id), tok))
    return out


def expand_pattern_terms(
    spark: SparkSession,
    index: dict,
    patterns: DataFrame,
    kind: str = "prefix",
    max_expansions: int = 1000,
) -> DataFrame:
    """(query_id, text) of whitespace-separated prefix / wildcard
    patterns -> (query_id, term) expanded over the term dictionary.

    kind='prefix': each token is a literal prefix (startswith join).
    kind='wildcard': tokens may contain ``*`` (any run) and ``?`` (one
    char); translated to an anchored regex, matched with RLIKE.
    Either way the dictionary streams through ONE broadcast join — no
    collect of term_stats, no per-pattern scan. Expansions capped at
    ``max_expansions`` highest-df terms per (query, pattern)."""
    pairs = _split_patterns(patterns)
    if not pairs:
        return spark.createDataFrame([], "query_id long, term string")
    if kind == "prefix":
        pdf = spark.createDataFrame(pairs, "query_id long, pat string")
        joined = index["term_stats"].join(
            F.broadcast(pdf), F.col("term").startswith(F.col("pat"))
        )
    elif kind == "wildcard":
        import re as _re

        def rx(p: str) -> str:
            return "^" + _re.escape(p).replace(r"\*", ".*").replace(r"\?", ".") + "$"

        pdf = spark.createDataFrame(
            [(q, p, rx(p)) for q, p in pairs], "query_id long, pat string, rx string"
        )
        joined = index["term_stats"].join(F.broadcast(pdf), F.expr("term RLIKE rx"))
    elif kind == "regexp":
        # tokens ARE regexes (whitespace-separated, so no spaces inside a
        # pattern — the Lucene RegexpQuery contract of term-level regexes
        # makes that a non-restriction); anchored to match whole terms
        pdf = spark.createDataFrame(
            [(q, p, f"^(?:{p})$") for q, p in pairs],
            "query_id long, pat string, rx string",
        )
        joined = index["term_stats"].join(F.broadcast(pdf), F.expr("term RLIKE rx"))
    else:
        raise ValueError(f"expand_pattern_terms: unknown kind {kind!r}")
    w = Window.partitionBy("query_id", "pat").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        joined.select("query_id", "pat", "term", "df")
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_expansions)
        .select("query_id", "term")
        .distinct()
    )


def bm25_segments_prefix(
    spark: SparkSession,
    index: dict,
    patterns: DataFrame,
    k: int = 10,
    max_expansions: int = 1000,
    round_digits: int | None = None,
) -> DataFrame:
    """Prefix top-k BM25: each pattern token expands to every dictionary
    term starting with it; expanded terms score through the plain
    segment path (Lucene PrefixQuery under scoring rewrite)."""
    expanded = expand_pattern_terms(spark, index, patterns, "prefix", max_expansions)
    return _bm25_from_qterms(spark, index, expanded, k, round_digits)


def bm25_segments_wildcard(
    spark: SparkSession,
    index: dict,
    patterns: DataFrame,
    k: int = 10,
    max_expansions: int = 1000,
    round_digits: int | None = None,
) -> DataFrame:
    """Wildcard (``*``/``?``) top-k BM25 via dictionary expansion —
    leading wildcards allowed (full dictionary stream, documented cost)."""
    expanded = expand_pattern_terms(spark, index, patterns, "wildcard", max_expansions)
    return _bm25_from_qterms(spark, index, expanded, k, round_digits)


def bm25_segments_regexp(
    spark: SparkSession,
    index: dict,
    patterns: DataFrame,
    k: int = 10,
    max_expansions: int = 1000,
    round_digits: int | None = None,
) -> DataFrame:
    """Regexp top-k BM25 (Lucene RegexpQuery under scoring rewrite):
    each whitespace-separated token is a regex matched against WHOLE
    dictionary terms; matches score through the plain segment path."""
    expanded = expand_pattern_terms(spark, index, patterns, "regexp", max_expansions)
    return _bm25_from_qterms(spark, index, expanded, k, round_digits)


def bm25_segments_paged(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    page: int = 1,
    size: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """from/size result pagination (the ES search_after-free default):
    page P of size S = ranks (P-1)·S+1 .. P·S of the pinned total order.
    Deep pages recompute the full prefix (cost grows with P·S — the
    documented from+size tradeoff; the shard kernels over-fetch P·S+32
    locally so the global slice is exact). rank stays GLOBAL so callers
    can stitch pages."""
    if page < 1:
        raise ValueError("bm25_segments_paged: page is 1-based")
    cfg = config or AnalyzerConfig()
    out = _bm25_from_qterms(
        spark, index, analyze_queries(queries, cfg), page * size, round_digits
    )
    return out.filter(F.col("rank") > (page - 1) * size)


def bm25_all_scores(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """(query_id, doc_id, score) for EVERY document in the disjunctive
    match set — no top-k cut. The scoring primitive under collapse /
    function-score / export-and-rerank workloads, where a local cut
    would be wrong (the best doc of a group, or the best boosted doc,
    need not be in any score-only top-k).

    Cost is honest: the full match set crosses the kernel boundary (same
    rows facet_counts aggregates). The direct kernel is forced — with no
    cut there is nothing for WAND to prune, so its bookkeeping is pure
    overhead. Output stays distributed, partitioned by doc-shard."""
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    n_shards = int(stats["n_shards"])
    matched = _matched_terms(spark, index, analyze_queries(queries, cfg))
    if matched is None:
        return spark.createDataFrame([], "query_id long, doc_id long, score double")
    return (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(
            _score_shard_kernel(2**62, n_docs, avgdl, use_blockmax=False),
            "query_id long, doc_id long, score double",
        )
    )


def search_sorted(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    sort_col: str,
    ascending: bool = False,
    k: int = 10,
    search_after: DataFrame | None = None,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Sort-by-field search (the ES ``sort`` clause): documents matching
    >= 1 analyzed query term, ranked by a metadata field instead of
    relevance; tiebreak doc_id asc (the ES ``_id`` tiebreaker contract).

    ``search_after`` (query_id, after_val, after_doc_id) is a keyset
    cursor — the (sort value, doc_id) of the last row of the previous
    page. Unlike from/size, deep pages don't recompute the prefix: the
    cursor predicate eliminates already-returned rows BEFORE the
    per-query top-k window, so page N costs the same as page 1. rank is
    page-local (1..k), as in ES.

    Scale shape: match set (never collected) joins doc metadata on
    doc_id — both sides distributed; the cursor set (one row per query)
    broadcasts."""
    matches = matching_docs(spark, index, queries, config)
    rows = matches.join(docs_meta.select("doc_id", sort_col), "doc_id")
    sval = F.col(sort_col)
    if search_after is not None:
        cmp = (sval > F.col("after_val")) if ascending else (sval < F.col("after_val"))
        rows = rows.join(F.broadcast(search_after), "query_id", "left").filter(
            F.col("after_val").isNull()
            | cmp
            | ((sval == F.col("after_val")) & (F.col("doc_id") > F.col("after_doc_id")))
        )
    order = sval.asc() if ascending else sval.desc()
    w = Window.partitionBy("query_id").orderBy(order, F.col("doc_id").asc())
    return (
        rows.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", F.col(sort_col).alias("sort_val"))
    )


def collapse_search(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    collapse_col: str,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Field collapsing (the ES ``collapse`` clause): per query, the
    top-k GROUPS by BM25, each represented by its single best-scoring
    document — one result per distinct ``collapse_col`` value (dedup-by-
    site in web search). Group champion and group ranking both use the
    pinned tie order (score desc, doc_id asc).

    Exactness requires scoring the full match set (a group's champion
    need not survive any score-only local top-k), so this rides
    bm25_all_scores; the two windows are hash-partitioned on
    (query, group) and (query) — never a global sort."""
    scored = bm25_all_scores(spark, index, queries, config)
    score = (
        F.round(F.col("score"), round_digits) if round_digits is not None else F.col("score")
    )
    rows = scored.join(docs_meta.select("doc_id", collapse_col), "doc_id")
    champ = Window.partitionBy("query_id", collapse_col).orderBy(
        score.desc(), F.col("doc_id").asc()
    )
    best = (
        rows.withColumn("_r", F.row_number().over(champ))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    w = Window.partitionBy("query_id").orderBy(score.desc(), F.col("doc_id").asc())
    return (
        best.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", F.col(collapse_col).alias("group_val"),
            "doc_id", score.alias("score"),
        )
    )


_FVF_MODIFIERS = {
    "none": lambda c: c,
    "log1p": lambda c: F.log(F.lit(1.0) + c),
    "sqrt": F.sqrt,
}


def function_score(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "log1p",
    boost_mode: str = "multiply",
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """ES ``function_score`` with a field_value_factor function:
    boost = modifier(factor * field), final = score <boost_mode> boost
    (multiply | sum). Static quality signals (popularity, length,
    recency buckets) re-rank relevance without reindexing.

    An arbitrary per-doc boost breaks WAND's score bounds, so the match
    set is scored exhaustively (bm25_all_scores) and boosted in pure
    Catalyst after a distributed metadata join — the documented ES
    tradeoff (function_score rescoring visits every match) made explicit."""
    mod = _FVF_MODIFIERS.get(modifier)
    if mod is None:
        raise ValueError(f"function_score: unknown modifier {modifier!r}")
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(f"function_score: unknown boost_mode {boost_mode!r}")
    scored = bm25_all_scores(spark, index, queries, config)
    boost = mod(F.lit(float(factor)) * F.col(field))
    combined = (
        F.col("score") * boost if boost_mode == "multiply" else F.col("score") + boost
    )
    rows = (
        scored.join(docs_meta.select("doc_id", field), "doc_id")
        .withColumn("score", combined)
        .select("query_id", "doc_id", "score")
    )
    return _topk_window(rows, k, round_digits)


_DECAY_FNS = ("gauss", "exp", "linear")


def decay_score(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    field: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    fn: str = "gauss",
    boost_mode: str = "multiply",
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """ES ``function_score`` decay functions (gauss | exp | linear) over
    a numeric per-doc field — the recency/geo-proximity boost: docs at
    ``origin`` keep full relevance, docs ``scale`` away are multiplied
    by ``decay``, per the ES decay contract
    (dist = max(0, |field - origin| - offset); gauss exp(-dist²/2σ²)
    with σ² = -scale²/(2·ln decay); exp e^{λ·dist} with λ = ln(decay)/scale;
    linear max(0, (s-dist)/s) with s = scale/(1-decay)).

    Same shape as :func:`function_score`: an arbitrary per-doc boost
    breaks WAND's bounds, so the match set is scored exhaustively and
    the decay is pure JVM-side Catalyst after a distributed metadata
    join."""
    if fn not in _DECAY_FNS:
        raise ValueError(f"decay_score: unknown decay function {fn!r}")
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(f"decay_score: unknown boost_mode {boost_mode!r}")
    if scale <= 0 or not (0.0 < decay < 1.0):
        raise ValueError("decay_score: need scale > 0 and 0 < decay < 1")
    scored = bm25_all_scores(spark, index, queries, config)
    dist = F.greatest(
        F.lit(0.0), F.abs(F.col(field) - F.lit(float(origin))) - F.lit(float(offset))
    )
    if fn == "gauss":
        sigma_sq = -(scale * scale) / (2.0 * math.log(decay))
        boost = F.exp(-(dist * dist) / F.lit(2.0 * sigma_sq))
    elif fn == "exp":
        boost = F.exp(F.lit(math.log(decay) / scale) * dist)
    else:
        s = scale / (1.0 - decay)
        boost = F.greatest(F.lit(0.0), (F.lit(s) - dist) / F.lit(s))
    combined = (
        F.col("score") * boost if boost_mode == "multiply" else F.col("score") + boost
    )
    rows = (
        scored.join(docs_meta.select("doc_id", field), "doc_id")
        .withColumn("score", combined)
        .select("query_id", "doc_id", "score")
    )
    return _topk_window(rows, k, round_digits)


def term_vectors(
    index: dict,
    docs: DataFrame,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """ES `_termvectors` contract: per (doc, term) of the given docs
    (doc_id, text) — tf, 0-based positions (comma-joined string for
    engine-portable comparison), and corpus df from the index
    dictionary. Store-and-reanalyze design (same as snippets): the
    requested docs are a user query (small), so re-tokenizing them beats
    scatter-decoding term-major postings; their term set broadcasts into
    the DISTRIBUTED dictionary for df."""
    cfg = config or AnalyzerConfig()
    toks = docs.select(
        "doc_id", F.posexplode(tokenize_col("text", cfg)).alias("pos", "term")
    )
    tv = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_join(F.sort_array(F.collect_list("pos")), ",").alias("positions"),
    )
    return (
        index["term_stats"]
        .join(F.broadcast(tv), "term")
        .select("doc_id", "term", "tf", "positions", "df")
    )


_FIELD_COLS = ["avgdl", *_TERM_COLS]


def _multifield_kernel(k: int):
    """mapInPandas kernel for multi-field scoring: one group per
    (query, doc-shard) gathers the matched posting rows of EVERY field
    (all fields shard docs identically), so cross-field sums are local
    and the shard-local top-k is exact."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], list[dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {c: getattr(row, c) for c in _FIELD_COLS}
                for q in row.query_ids:
                    groups.setdefault((int(q), int(row.shard)), []).append(t)
        out_q, out_d, out_s = [], [], []
        for (q, _shard), terms in groups.items():
            res = wand.score_query_fields(terms, k)
            ids, scores = res["doc_ids"], res["scores"]
            out_q.extend([q] * len(ids))
            out_d.extend(np.asarray(ids).tolist())
            out_s.extend(np.asarray(scores).tolist())
        yield pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return fn


def bm25_multifield(
    spark: SparkSession,
    indexes: dict[str, dict],
    boosts: dict[str, float],
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Multi-field top-k BM25 with field boosts:

        score(q, d) = Σ_field boost_f * bm25_f(q, d)

    where bm25_f uses field f's OWN df/N/avgdl (per-field BM25 summed —
    the Lucene MultiFieldQueryParser contract; docs whose field is empty
    contribute no doc_stats row, so they don't count toward that field's
    N or avgdl, matching Lucene's per-field docCount). ``indexes`` maps field
    name -> a load_index() handle; every field must be built with the
    same n_shards so a doc's postings from all fields land in the same
    doc-shard group and combine locally (shard = pmod(xxhash64(doc_id)) is
    build-parameter-deterministic). The per-field matched segments UNION
    (no join between fields!), one shuffle on shard, exhaustive local
    accumulation, global top-k."""
    cfg = config or AnalyzerConfig()
    fields = sorted(indexes)
    if not fields:
        raise ValueError("bm25_multifield: no field indexes given")
    shard_counts = {int(indexes[f]["stats"]["n_shards"]) for f in fields}
    if len(shard_counts) != 1:
        raise ValueError(
            f"bm25_multifield: field indexes disagree on n_shards: {shard_counts}"
        )
    n_shards = shard_counts.pop()

    q_terms = analyze_queries(queries, cfg)
    terms = [r.term for r in q_terms.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    q_term_lists = q_terms.groupBy("term").agg(
        F.collect_list("query_id").alias("query_ids")
    )

    parts = []
    for f in fields:
        idx = indexes[f]
        stats = idx["stats"]
        n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
        n_buckets = int(stats["n_buckets"])
        buckets = list({
            b.term_bucket
            for b in spark.createDataFrame([(t,) for t in terms], "term string")
            .select(term_bucket_col(F.col("term"), n_buckets).alias("term_bucket"))
            .collect()
        })
        seg = (
            idx["segments"]
            .filter(F.col("term_bucket").isin(buckets))
            .filter(F.col("term").isin(terms))
        )
        tstats = idx["term_stats"].filter(F.col("term").isin(terms))
        parts.append(
            seg.join(F.broadcast(q_term_lists), "term")
            .join(F.broadcast(tstats), "term")
            .withColumn(
                "idf", _idf(F.col("df"), n_docs) * F.lit(float(boosts.get(f, 1.0)))
            )
            .withColumn("avgdl", F.lit(avgdl))
            .select("query_ids", "shard", *_FIELD_COLS)
        )
    matched = parts[0]
    for p in parts[1:]:
        matched = matched.unionByName(p)

    candidates = matched.repartition(
        _shard_partitions(spark, n_shards), "shard"
    ).mapInPandas(_multifield_kernel(k + 32), "query_id long, doc_id long, score double")
    return _topk_window(candidates, k, round_digits)


def dis_max(
    spark: SparkSession,
    indexes: dict[str, dict],
    queries: DataFrame,
    tie_breaker: float = 0.0,
    boosts: dict[str, float] | None = None,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """ES ``dis_max`` / ``multi_match best_fields``: per doc the BEST
    single field's score wins, plus ``tie_breaker`` times every other
    matching field's score —

        score(q, d) = max_f s_f + tie_breaker * (Σ_f s_f - max_f s_f)

    the complement of :func:`bm25_multifield`'s summed ``most_fields``
    mode (tie_breaker=1 reproduces the sum; 0 is pure best-field).

    Scale shape: each field's match set scores exhaustively through its
    own segment store (bm25_all_scores — per-field df/N/avgdl), the
    per-field rows UNION (no join between fields), and one hash
    aggregate on (query, doc) computes max and sum together — a single
    shuffle keyed by the candidate pair."""
    if not indexes:
        raise ValueError("dis_max: no field indexes given")
    if not (0.0 <= tie_breaker <= 1.0):
        raise ValueError("dis_max: tie_breaker must be in [0, 1]")
    parts = []
    for f in sorted(indexes):
        s = bm25_all_scores(spark, indexes[f], queries, config)
        b = float((boosts or {}).get(f, 1.0))
        parts.append(s.select("query_id", "doc_id", (F.col("score") * F.lit(b)).alias("score")))
    allf = parts[0]
    for p in parts[1:]:
        allf = allf.unionByName(p)
    combined = (
        allf.groupBy("query_id", "doc_id")
        .agg(F.max("score").alias("best"), F.sum("score").alias("total"))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("best")
                + F.lit(float(tie_breaker)) * (F.col("total") - F.col("best"))
            ).alias("score"),
        )
    )
    return _topk_window(combined, k, round_digits)


def _wand_stats_kernel(k: int, avgdl: float):
    """Stats twin of _score_shard_kernel: same Block-Max WAND pass, but
    emits the pruning counters (blocks decoded vs total) per
    (query, shard) instead of candidates — the observability surface
    guarding against silent regressions to exhaustive decode."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], list[dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {c: getattr(row, c) for c in _TERM_COLS}
                for q in row.query_ids:
                    groups.setdefault((int(q), int(row.shard)), []).append(t)
        out = {"query_id": [], "shard": [], "blocks_total": [], "blocks_decoded": []}
        for (q, shard), terms in groups.items():
            res = wand.score_query_shard(terms, avgdl, k)
            out["query_id"].append(q)
            out["shard"].append(shard)
            out["blocks_total"].append(res["blocks_total"])
            out["blocks_decoded"].append(res["blocks_decoded"])
        yield pd.DataFrame(out)

    return fn


def bm25_wand_stats(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
) -> DataFrame:
    """(query_id, shard, blocks_total, blocks_decoded) for the Block-Max
    WAND pass of each query — aggregate ``1 - sum(decoded)/sum(total)``
    is the pruning rate reported in BENCH."""
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    n_buckets = int(stats["n_buckets"])
    n_shards = int(stats["n_shards"])

    q_terms = analyze_queries(queries, cfg)
    q_term_lists = (
        q_terms.groupBy("term")
        .agg(F.collect_list("query_id").alias("query_ids"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )
    matched = (
        index["segments"]
        .join(q_term_lists, ["term_bucket", "term"])
        .join(index["term_stats"], "term")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .select("query_ids", "shard", *_TERM_COLS)
    )
    out_schema = "query_id long, shard int, blocks_total long, blocks_decoded long"
    return matched.repartition(_shard_partitions(spark, n_shards), "shard").mapInPandas(
        _wand_stats_kernel(k, avgdl), out_schema
    )


def bm25_segments_batch(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
    use_blockmax: bool = True,
    direct_max_blocks: int = DIRECT_MAX_BLOCKS,
    pruning: str = "wand",
) -> DataFrame:
    """Batch-regime top-k BM25: the query set joins the segments
    RELATIONALLY — no driver ``collect()`` of the term list anywhere.

    ``bm25_segments`` is the interactive path: it collects the (small)
    query term set to the driver so term/bucket predicates push into the
    parquet scan (partition + rowgroup pruning) — optimal for a handful
    of terms, wrong for 10^5+-query batches where the term list itself is
    big data. Here the analyzed query terms stay a DataFrame: segments
    equi-join (term_bucket, term) against it (AQE picks broadcast vs
    shuffle by the actual term-set size), term_stats joins the same way,
    and the per-shard scoring kernel is shared with the interactive path.
    Results are exactly equal (tested)."""
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    n_buckets = int(stats["n_buckets"])
    n_shards = int(stats["n_shards"])

    q_terms = analyze_queries(queries, cfg)
    # one row per distinct term with its query list (a head term shared
    # by many queries still ships ONE posting row through the join)
    q_term_lists = (
        q_terms.groupBy("term")
        .agg(F.collect_list("query_id").alias("query_ids"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )
    matched = (
        index["segments"]
        .join(q_term_lists, ["term_bucket", "term"])
        .join(index["term_stats"], "term")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .select("query_ids", "shard", *_TERM_COLS)
    )
    out_schema = "query_id long, doc_id long, score double"
    # doc-sharded index: margin only needed under rounded-score ranking
    # (see bm25_segments) — the batch regime's candidate volume is
    # n_shards * k_local * n_queries, so the margin is the scale lever
    k_local = k + 32 if round_digits is not None else k
    candidates = (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(
            _score_shard_kernel(
                k_local, n_docs, avgdl, use_blockmax, direct_max_blocks, pruning
            ),
            out_schema,
        )
    )
    return _topk_window(candidates, k, round_digits)


def _conjunctive_kernel(k: int, avgdl: float):
    """mapInPandas kernel for AND semantics: per (query, doc-shard),
    intersect the posting doc_id arrays rarest-first (a doc's postings
    for ALL terms live in its shard — doc-partitioning makes per-shard
    intersection exact), then score only the survivors. Emits
    (query_id, doc_id, score, n_terms) where n_terms is how many
    distinct terms matched the index — the caller filters against the
    query's analyzed term count so queries with any unindexed term
    return nothing (strict AND)."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], list[dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {c: getattr(row, c) for c in _TERM_COLS}
                for q in row.query_ids:
                    groups.setdefault((int(q), int(row.shard)), []).append(t)
        out = {"query_id": [], "doc_id": [], "score": [], "n_terms": []}
        for (q, _shard), terms in groups.items():
            terms = sorted(terms, key=lambda t: int(t["n_postings"]))
            cand = wand.decode_full_memo(terms[0])[0]
            for t in terms[1:]:
                if cand.size == 0:
                    break
                cand = cand[np.isin(cand, wand.decode_full_memo(t)[0],
                                    assume_unique=True)]
            if cand.size == 0:
                continue
            scores = np.zeros(cand.size, dtype=np.float64)
            for t in terms:
                doc_ids = wand.decode_full_memo(t)[0]
                norms = wand.norms_memo(t, avgdl)
                idx = np.searchsorted(doc_ids, cand)
                scores += float(t["idf"]) * norms[idx]
            sel = np.lexsort((cand, -scores))[:k]
            out["query_id"].extend([q] * len(sel))
            out["doc_id"].extend(cand[sel].tolist())
            out["score"].extend(scores[sel].tolist())
            out["n_terms"].extend([len(terms)] * len(sel))
        yield pd.DataFrame(out)

    return fn


def bm25_segments_conjunctive(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Top-k BM25 with AND semantics: only documents containing EVERY
    analyzed query term are ranked (the classic conjunctive retrieval
    mode). Doc-sharding makes this embarrassingly parallel: a doc's
    postings for all terms are co-located in its shard, so each shard
    intersects rarest-first and scores survivors; a query with any term
    absent from the index matches nothing."""
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    n_buckets = int(stats["n_buckets"])
    n_shards = int(stats["n_shards"])

    q_terms = analyze_queries(queries, cfg)
    q_counts = q_terms.groupBy("query_id").agg(
        F.countDistinct("term").alias("n_query_terms")
    )
    q_term_lists = (
        q_terms.groupBy("term")
        .agg(F.collect_list("query_id").alias("query_ids"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )
    matched = (
        index["segments"]
        .join(q_term_lists, ["term_bucket", "term"])
        .join(index["term_stats"], "term")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .select("query_ids", "shard", *_TERM_COLS)
    )
    out_schema = "query_id long, doc_id long, score double, n_terms int"
    candidates = (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(_conjunctive_kernel(k + 32, avgdl), out_schema)
        # strict AND: every analyzed term must have matched the index
        .join(q_counts, "query_id")
        .filter(F.col("n_terms") == F.col("n_query_terms"))
        .select("query_id", "doc_id", "score")
    )
    return _topk_window(candidates, k, round_digits)


def _msm_kernel(k: int, avgdl: float, min_match: int):
    """mapInPandas kernel for minimum_should_match semantics: per
    (query, doc-shard), accumulate BM25 scores AND per-doc distinct-term
    match counts in one vectorized pass (concatenate decoded lists →
    np.unique inverse-scatter), keep docs matching >= min_match distinct
    query terms. Doc-sharding makes the count exact per shard (a doc's
    postings for all terms are co-located). min_match=1 is disjunctive
    BM25; min_match=len(query terms) is conjunctive — both asserted
    equal to their dedicated paths in tests."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], list[dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {c: getattr(row, c) for c in _TERM_COLS}
                for q in row.query_ids:
                    groups.setdefault((int(q), int(row.shard)), []).append(t)
        out = {"query_id": [], "doc_id": [], "score": []}
        for (q, _shard), terms in groups.items():
            if len(terms) < min_match:
                continue  # not enough matched clauses to ever qualify
            all_ids = np.concatenate([wand.decode_full_memo(t)[0] for t in terms])
            all_scores = np.concatenate(
                [float(t["idf"]) * wand.norms_memo(t, avgdl) for t in terms]
            )
            # analyze_queries emits DISTINCT terms per query, so each list
            # contributes a doc at most once: occurrence count == number of
            # distinct query terms matching the doc
            ids, inv, counts = np.unique(
                all_ids, return_inverse=True, return_counts=True
            )
            scores = np.zeros(ids.size, dtype=np.float64)
            np.add.at(scores, inv, all_scores)
            keep = counts >= min_match
            ids, scores = ids[keep], scores[keep]
            sel = np.lexsort((ids, -scores))[:k]
            out["query_id"].extend([q] * len(sel))
            out["doc_id"].extend(ids[sel].tolist())
            out["score"].extend(scores[sel].tolist())
        yield pd.DataFrame(out)

    return fn


def bm25_segments_msm(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    min_match: int = 1,
    round_digits: int | None = None,
) -> DataFrame:
    """Top-k BM25 with minimum_should_match semantics (the Lucene/ES
    ``minimum_should_match`` knob): a document ranks only if it contains
    at least ``min_match`` distinct analyzed query terms. Terms absent
    from the index are clauses that match nothing — a query can still
    satisfy ``min_match`` through its other terms (standard Boolean-query
    behavior). min_match=1 degenerates to disjunctive top-k."""
    if min_match < 1:
        raise ValueError(f"min_match must be >= 1, got {min_match}")
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    n_buckets = int(stats["n_buckets"])
    n_shards = int(stats["n_shards"])

    q_terms = analyze_queries(queries, cfg)
    q_term_lists = (
        q_terms.groupBy("term")
        .agg(F.collect_list("query_id").alias("query_ids"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )
    matched = (
        index["segments"]
        .join(q_term_lists, ["term_bucket", "term"])
        .join(index["term_stats"], "term")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .select("query_ids", "shard", *_TERM_COLS)
    )
    out_schema = "query_id long, doc_id long, score double"
    candidates = (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(_msm_kernel(k + 32, avgdl, min_match), out_schema)
    )
    return _topk_window(candidates, k, round_digits)


def analyze_phrases(queries: DataFrame, config: AnalyzerConfig) -> DataFrame:
    """(query_id, text) -> (query_id, seq, term): ordered, duplicates kept
    (unlike analyze_queries — phrase matching needs token order)."""
    return queries.select(
        "query_id",
        F.posexplode(tokenize_col("text", config)).alias("seq", "term"),
    )


def _phrase_shard_kernel():
    """mapInPandas kernel: per (phrase, doc-shard), intersect posting
    lists in phrase order, then verify adjacency via the per-posting
    position blobs. Emits (query_id, doc_id, n_occurrences) for docs
    containing the exact phrase (occurrences counted overlapping)."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], dict[int, dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {
                    "n_postings": int(row.n_postings),
                    "doc_ids_blob": row.doc_ids_blob,
                    "tfs_blob": row.tfs_blob,
                    "dls_blob": row.dls_blob,
                    "pos_blob": row.pos_blob,
                    "codec": getattr(row, "codec", "varint"),
                    "block_doc_off": getattr(row, "block_doc_off", None),
                    "block_last": getattr(row, "block_last", None),
                }
                for occ in row.occurrences:  # array<struct<query_id,seq>>
                    groups.setdefault((int(occ["query_id"]), int(row.shard)), {})[
                        int(occ["seq"])
                    ] = t
                    # NOTE: duplicate term at several seq positions maps the
                    # SAME dict — decode once, reuse
        out_q, out_d, out_n = [], [], []
        for (q, _shard), by_seq in groups.items():
            n_terms = max(by_seq) + 1
            if len(by_seq) < n_terms:
                continue  # some phrase term missing entirely in this shard
            decoded = {}
            for seq, t in by_seq.items():
                key = id(t)
                if key not in decoded:
                    ids, tfs, _dls = codec.decode_posting_list(t)
                    pos, offs = codec.decode_positions(bytes(t["pos_blob"]), tfs)
                    decoded[key] = (ids, tfs, pos, offs)
            # intersect doc ids across all phrase terms (rarest first)
            seqs = sorted(by_seq, key=lambda s: decoded[id(by_seq[s])][0].size)
            cand = decoded[id(by_seq[seqs[0]])][0]
            for s in seqs[1:]:
                cand = cand[np.isin(cand, decoded[id(by_seq[s])][0], assume_unique=True)]
                if cand.size == 0:
                    break
            for d in cand.tolist():
                # positions of seq 0 in doc d, then slide the window
                starts = None
                ok = True
                for seq in range(n_terms):
                    ids, tfs, pos, offs = decoded[id(by_seq[seq])]
                    j = int(np.searchsorted(ids, d))
                    p = pos[offs[j] : offs[j] + tfs[j]]
                    if starts is None:
                        starts = p
                    else:
                        starts = starts[np.isin(starts + seq, p, assume_unique=True)]
                    if starts.size == 0:
                        ok = False
                        break
                if ok and starts.size:
                    out_q.append(q)
                    out_d.append(d)
                    out_n.append(int(starts.size))
        yield pd.DataFrame({"query_id": out_q, "doc_id": out_d, "n_occurrences": out_n})

    return fn


_BLOB_COLS = [
    "n_postings", "doc_ids_blob", "tfs_blob", "dls_blob",
    "codec", "block_doc_off", "block_last",
]


def _matching_docs_kernel():
    """mapInPandas kernel: per (query, doc-shard), the UNION of decoded
    posting doc_id arrays — the disjunctive match set, no scoring, no
    truncation. Doc-sharding keeps the per-group dedup exact and local."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], list[dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {c: getattr(row, c) for c in _BLOB_COLS}
                for q in row.query_ids:
                    groups.setdefault((int(q), int(row.shard)), []).append(t)
        out_q, out_d = [], []
        for (q, _shard), terms in groups.items():
            ids = np.unique(
                np.concatenate([wand.decode_full_memo(t)[0] for t in terms])
            )
            out_q.extend([q] * ids.size)
            out_d.extend(ids.tolist())
        yield pd.DataFrame({"query_id": out_q, "doc_id": out_d})

    return fn


def matching_docs(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """(query_id, doc_id) for every document matching >= 1 analyzed query
    term — the full disjunctive match set (the input to faceting,
    counting, and export workloads, where top-k truncation is wrong)."""
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    n_buckets = int(stats["n_buckets"])
    n_shards = int(stats["n_shards"])

    q_terms = analyze_queries(queries, cfg)
    q_term_lists = (
        q_terms.groupBy("term")
        .agg(F.collect_list("query_id").alias("query_ids"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )
    matched = (
        index["segments"]
        .join(q_term_lists, ["term_bucket", "term"])
        .select("query_ids", "shard", *_BLOB_COLS)
    )
    return (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(_matching_docs_kernel(), "query_id long, doc_id long")
    )


def facet_counts(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    facet_col: str,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Facet aggregation over the FULL match set (not just top-k): for
    each query, count matching documents per value of ``facet_col`` in
    ``docs_meta`` (doc_id + metadata columns). The match set never
    collects anywhere: (query_id, doc_id) rows join doc metadata on
    doc_id and hash-aggregate with map-side partials — both sides stay
    distributed, the standard facet pipeline shape."""
    matches = matching_docs(spark, index, queries, config)
    return (
        matches.join(docs_meta.select("doc_id", facet_col), "doc_id")
        .groupBy("query_id", facet_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def histogram_facet(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    value_col: str,
    bucket_width: float,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Numeric histogram facet over the FULL match set: for each query,
    count matching documents per fixed-width bucket of ``value_col``
    (bucket = floor(value / width) * width — the ES histogram agg
    contract). Same distributed shape as facet_counts."""
    if bucket_width <= 0:
        raise ValueError("histogram_facet: bucket_width must be > 0")
    matches = matching_docs(spark, index, queries, config)
    bucket = (
        F.floor(F.col(value_col) / F.lit(float(bucket_width)))
        * F.lit(float(bucket_width))
    ).alias("bucket")
    return (
        matches.join(docs_meta.select("doc_id", value_col), "doc_id")
        .select("query_id", bucket)
        .groupBy("query_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def top_hits_facet(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    facet_col: str,
    sort_field: str,
    k: int = 3,
    ascending: bool = False,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """ES ``terms`` aggregation with a ``top_hits`` sub-aggregation: for
    each query and each value of ``facet_col``, return the top-``k``
    matching documents ordered by ``sort_field`` (doc_id breaks ties so
    the result is deterministic).

    Scale shape: the match set stays distributed (matching_docs kernel),
    joins doc metadata on doc_id, and ranks with a window partitioned by
    (query, facet value) — the shuffle key is the bucket, so 1000
    executors each own a slice of the bucket space and only k rows per
    bucket survive the rank filter."""
    matches = matching_docs(spark, index, queries, config)
    sort = F.col(sort_field).asc() if ascending else F.col(sort_field).desc()
    w = Window.partitionBy("query_id", facet_col).orderBy(sort, F.col("doc_id").asc())
    return (
        matches.join(docs_meta.select("doc_id", facet_col, sort_field), "doc_id")
        .withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= k)
        .select("query_id", facet_col, "hit_rank", "doc_id", sort_field)
    )


def boolean_search(
    spark: SparkSession,
    index: dict,
    expr,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Evaluate a boolean query tree over the index; returns the matching
    doc_id set (one column, distinct).

    ``expr`` is nested tuples:
        ("term", "hash join")        — leaf: docs containing >= 1 analyzed
                                       token of the text (disjunctive,
                                       same contract as matching_docs)
        ("and",  [e1, e2, ...])      — intersection
        ("or",   [e1, e2, ...])      — union
        ("not",  e)                  — complement; inside an AND this is
                                       a left_anti (MUST_NOT); at top
                                       level it complements against the
                                       full doc_stats universe.

    Scale shape: ALL leaves batch into ONE matching_docs pass (one
    segment scan), the per-leaf sets stay distributed, and composition is
    pure relational algebra — left_semi for AND, union+distinct for OR,
    left_anti for NOT. Nothing collects."""
    cfg = config or AnalyzerConfig()
    leaves: list[str] = []

    def collect_leaves(node):
        op = node[0]
        if op == "term":
            leaves.append(node[1])
        elif op in ("and", "or"):
            for child in node[1]:
                collect_leaves(child)
        elif op == "not":
            collect_leaves(node[1])
        else:
            raise ValueError(f"boolean_search: unknown op {op!r}")

    collect_leaves(expr)
    uniq = sorted(set(leaves))
    if not uniq:
        raise ValueError("boolean_search: expression has no term leaves")
    leaf_id = {t: i for i, t in enumerate(uniq)}
    qdf = spark.createDataFrame(
        [(i, t) for t, i in leaf_id.items()], "query_id long, text string"
    )
    matches = matching_docs(spark, index, qdf, cfg).cache()
    universe = index["doc_stats"].select("doc_id")

    def ev(node) -> DataFrame:
        op = node[0]
        if op == "term":
            return matches.filter(
                F.col("query_id") == leaf_id[node[1]]
            ).select("doc_id")
        if op == "and":
            pos = [c for c in node[1] if c[0] != "not"]
            neg = [c[1] for c in node[1] if c[0] == "not"]
            acc = ev(pos[0]) if pos else universe
            for c in pos[1:]:
                acc = acc.join(ev(c), "doc_id", "left_semi")
            for c in neg:
                acc = acc.join(ev(c), "doc_id", "left_anti")
            return acc
        if op == "or":
            out = ev(node[1][0])
            for c in node[1][1:]:
                out = out.unionByName(ev(c))
            return out.distinct()
        if op == "not":
            return universe.join(ev(node[1]), "doc_id", "left_anti")
        raise ValueError(f"boolean_search: unknown op {op!r}")

    return ev(expr).distinct()


def snippets(
    spark: SparkSession,
    docs: DataFrame,
    results: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    window: int = 8,
) -> DataFrame:
    """Highlighted snippets for search results: for each (query, doc) in
    ``results`` (any bm25_* output — columns query_id, doc_id, plus
    whatever else, carried through), re-analyze the document's stored
    text and cut a ``window``-token passage centered on the FIRST
    occurrence of any analyzed query term, wrapping matched terms in
    <em>..</em> (the standard store-and-reanalyze highlighter design —
    only the k hit docs per query are ever re-tokenized, never the
    corpus). Pure Catalyst: array lambdas end-to-end, no Python UDF in
    the highlight path beyond the analyzer itself.

    Deterministic rule (shared with the DuckDB oracle): snippet start =
    max(0, first_match_pos - (window-1)//2), length ``window`` tokens of
    the ANALYZED token stream."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    cfg = config or AnalyzerConfig()
    off = (window - 1) // 2

    # hit docs per query are tiny (k per query) — broadcast the id set so
    # the docs scan gets a dynamic semi-join filter instead of a shuffle
    doc_ids = results.select("doc_id").distinct()
    toks = (
        docs.join(F.broadcast(doc_ids), "doc_id")
        .select("doc_id", tokenize_col("text", cfg).alias("toks"))
    )
    q_sets = (
        analyze_queries(queries, cfg)
        .groupBy("query_id")
        .agg(F.collect_set("term").alias("qterms"))
    )
    carried = [c for c in results.columns if c not in ("query_id", "doc_id")]
    out = (
        results.join(F.broadcast(q_sets), "query_id")
        .join(toks, "doc_id")
        .withColumn(
            "p0",
            F.expr(
                "array_min(filter(transform(toks, (x, i) -> "
                "IF(array_contains(qterms, x), i, -1)), i -> i >= 0))"
            ),
        )
        .filter(F.col("p0").isNotNull())
        .withColumn("start", F.greatest(F.lit(0), F.col("p0") - F.lit(off)))
        .withColumn(
            "snippet",
            F.expr(
                f"array_join(transform(slice(toks, start + 1, {window}), "
                "x -> IF(array_contains(qterms, x), "
                "concat('<em>', x, '</em>'), x)), ' ')"
            ),
        )
    )
    return out.select("query_id", "doc_id", *carried, "snippet")


def _proximity_shard_kernel(slop: int):
    """mapInPandas kernel for sloppy-phrase matching: per (phrase,
    doc-shard), intersect posting lists rarest-first, then for every
    surviving doc compute the MINIMAL ordered span via a vectorized
    greedy chain — for every start position of term 0, successively pick
    the smallest position of term i strictly greater than the chain's
    current end (np.searchsorted over the whole frontier at once). The
    greedy chain yields the minimal possible end for each start, hence
    the minimal span. A doc matches when
    min_span <= (n_terms - 1) + slop; slop=0 degenerates to exact-phrase
    containment (strictly increasing positions with span n-1 must be
    consecutive). Emits (query_id, doc_id, span=min_span)."""

    def fn(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict[tuple[int, int], dict[int, dict]] = {}
        for pdf in batch_iter:
            for row in pdf.itertuples(index=False):
                t = {
                    "n_postings": int(row.n_postings),
                    "doc_ids_blob": row.doc_ids_blob,
                    "tfs_blob": row.tfs_blob,
                    "dls_blob": row.dls_blob,
                    "pos_blob": row.pos_blob,
                    "codec": getattr(row, "codec", "varint"),
                    "block_doc_off": getattr(row, "block_doc_off", None),
                    "block_last": getattr(row, "block_last", None),
                }
                for occ in row.occurrences:
                    groups.setdefault((int(occ["query_id"]), int(row.shard)), {})[
                        int(occ["seq"])
                    ] = t
        out_q, out_d, out_s = [], [], []
        for (q, _shard), by_seq in groups.items():
            n_terms = max(by_seq) + 1
            if len(by_seq) < n_terms:
                continue
            max_span = (n_terms - 1) + slop
            decoded = {}
            for t in by_seq.values():
                key = id(t)
                if key not in decoded:
                    ids, tfs, _dls = codec.decode_posting_list(t)
                    pos, offs = codec.decode_positions(bytes(t["pos_blob"]), tfs)
                    decoded[key] = (ids, tfs, pos, offs)
            seqs = sorted(by_seq, key=lambda s: decoded[id(by_seq[s])][0].size)
            cand = decoded[id(by_seq[seqs[0]])][0]
            for s in seqs[1:]:
                cand = cand[np.isin(cand, decoded[id(by_seq[s])][0], assume_unique=True)]
                if cand.size == 0:
                    break
            for d in cand.tolist():
                pos_by_seq = []
                for seq in range(n_terms):
                    ids, tfs, pos, offs = decoded[id(by_seq[seq])]
                    j = int(np.searchsorted(ids, d))
                    pos_by_seq.append(pos[offs[j] : offs[j] + tfs[j]])
                starts = pos_by_seq[0]
                ends = starts
                for seq in range(1, n_terms):
                    p = pos_by_seq[seq]
                    idx = np.searchsorted(p, ends, side="right")
                    valid = idx < p.size
                    starts, idx = starts[valid], idx[valid]
                    if starts.size == 0:
                        break
                    ends = p[idx]
                if starts.size == 0:
                    continue
                span = int(np.min(ends - starts))
                if span <= max_span:
                    out_q.append(q)
                    out_d.append(d)
                    out_s.append(span)
        yield pd.DataFrame({"query_id": out_q, "doc_id": out_d, "span": out_s})

    return fn


def proximity_search(
    spark: SparkSession,
    index: dict,
    phrases: DataFrame,
    config: AnalyzerConfig | None = None,
    slop: int = 0,
) -> DataFrame:
    """Sloppy-phrase (proximity) search over the positional index:
    returns (query_id, doc_id, span) for every document whose token
    stream contains the analyzed phrase terms IN ORDER within a window
    of at most (n_terms - 1) + slop positions; ``span`` is the minimal
    such window (last_pos - first_pos). slop=0 is exact-phrase
    containment (tested equal to phrase_search)."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    if stats.get("store_positions") is False:
        raise ValueError(
            "proximity_search requires a positional index; this one was "
            "built with store_positions=False"
        )
    n_buckets = int(stats["n_buckets"])
    n_shards = int(stats["n_shards"])

    p_terms = analyze_phrases(phrases, cfg)
    terms = [r.term for r in p_terms.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame([], "query_id long, doc_id long, span long")
    buckets = list({b.term_bucket for b in
                    spark.createDataFrame([(t,) for t in terms], "term string")
                    .select(term_bucket_col(F.col("term"), n_buckets).alias("term_bucket"))
                    .collect()})

    occurrences = p_terms.groupBy("term").agg(
        F.collect_list(F.struct("query_id", "seq")).alias("occurrences")
    )
    seg = (
        index["segments"]
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    matched = seg.join(F.broadcast(occurrences), "term").select(
        "occurrences", "shard", "n_postings",
        "doc_ids_blob", "tfs_blob", "dls_blob", "pos_blob",
        "codec", "block_doc_off", "block_last",
    )
    out_schema = "query_id long, doc_id long, span long"
    return (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(_proximity_shard_kernel(slop), out_schema)
        .orderBy("query_id", "doc_id")
    )


def phrase_search(
    spark: SparkSession,
    index: dict,
    phrases: DataFrame,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Exact-phrase containment over the positional index: returns
    (query_id, doc_id, n_occurrences) for every document whose token
    stream contains the analyzed phrase consecutively. Requires an index
    built with store_positions=True."""
    cfg = config or AnalyzerConfig()
    stats = index["stats"]
    if stats.get("store_positions") is False:
        raise ValueError(
            "phrase_search requires a positional index; this one was built "
            "with store_positions=False — rebuild with store_positions=True"
        )
    n_buckets = int(stats["n_buckets"])
    n_shards = int(stats["n_shards"])

    p_terms = analyze_phrases(phrases, cfg)
    terms = [r.term for r in p_terms.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame([], "query_id long, doc_id long, n_occurrences long")
    buckets = list({b.term_bucket for b in
                    spark.createDataFrame([(t,) for t in terms], "term string")
                    .select(term_bucket_col(F.col("term"), n_buckets).alias("term_bucket"))
                    .collect()})

    occurrences = p_terms.groupBy("term").agg(
        F.collect_list(F.struct("query_id", "seq")).alias("occurrences")
    )
    seg = (
        index["segments"]
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    matched = seg.join(F.broadcast(occurrences), "term").select(
        "occurrences", "shard", "n_postings",
        "doc_ids_blob", "tfs_blob", "dls_blob", "pos_blob",
        "codec", "block_doc_off", "block_last",
    )
    out_schema = "query_id long, doc_id long, n_occurrences long"
    return (
        matched.repartition(_shard_partitions(spark, n_shards), "shard")
        .mapInPandas(_phrase_shard_kernel(), out_schema)
        .orderBy("query_id", "doc_id")
    )


def terms_set_search(
    docs: DataFrame,
    terms: list[str],
    msm_expr,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """ES ``terms_set`` query: documents matching at least a PER-DOCUMENT
    number of the candidate terms (minimum_should_match_field /
    minimum_should_match_script — ``msm_expr`` is a Column computed from
    the doc row, e.g. ``F.col("required_matches")``). Returns
    (doc_id, n_matched, required) for matching docs.

    Relational twin of the fixed-msm segment path (bm25 msm): distinct
    (term, doc) pairs from the analyzed token stream semi-joined against
    the broadcast term set, counted per doc, then compared to the per-doc
    requirement. All JVM-side; the candidate set is query-bounded so the
    join broadcasts."""
    cfg = config or AnalyzerConfig()
    spark = docs.sparkSession
    tset = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term string")
    )
    matched = (
        postings_df(docs, cfg)
        .join(tset, "term")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    required = docs.select("doc_id", msm_expr.cast("long").alias("required"))
    return (
        matched.join(required, "doc_id")
        .filter(F.col("n_matched") >= F.col("required"))
        .select("doc_id", "n_matched", "required")
    )


_RANK_FEATURE_FNS = ("saturation", "log", "sigmoid")


def rank_feature_search(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    field: str,
    fn: str = "saturation",
    pivot: float = 1.0,
    boost: float = 1.0,
    exponent: float = 1.0,
    scaling_factor: float = 1.0,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """ES ``rank_feature`` query in a bool-should next to the text match:
    a static per-doc signal (pagerank, url_length, popularity) ADDS to the
    BM25 score via one of the ES rank_feature functions —
    saturation ``boost * x / (x + pivot)``,
    log ``boost * ln(1 + scaling_factor * x)``,
    sigmoid ``boost * x^exp / (x^exp + pivot^exp)``.

    Scale shape: same contract as :func:`function_score` — an arbitrary
    additive per-doc boost breaks WAND's score upper bounds, so the match
    set is scored exhaustively (the documented ES tradeoff: rank_feature
    is only WAND-safe inside ES because the feature is indexed into an
    impact-ordered structure; without reindexing, exhaustive + Catalyst
    join is the honest plan).  The boost arithmetic is pure JVM-side."""
    if fn not in _RANK_FEATURE_FNS:
        raise ValueError(f"rank_feature_search: unknown function {fn!r}")
    scored = bm25_all_scores(spark, index, queries, config)
    x = F.col(field).cast("double")
    if fn == "saturation":
        feat = x / (x + F.lit(float(pivot)))
    elif fn == "log":
        feat = F.log(F.lit(1.0) + F.lit(float(scaling_factor)) * x)
    else:
        xe = F.pow(x, F.lit(float(exponent)))
        feat = xe / (xe + F.lit(float(pivot) ** float(exponent)))
    rows = (
        scored.join(docs_meta.select("doc_id", field), "doc_id")
        .withColumn("score", F.col("score") + F.lit(float(boost)) * feat)
        .select("query_id", "doc_id", "score")
    )
    return _topk_window(rows, k, round_digits)


def distance_feature_search(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    docs_meta: DataFrame,
    field: str,
    origin,
    pivot: float,
    boost: float = 1.0,
    kind: str = "date",
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """ES ``distance_feature`` query in a bool-should: proximity of a
    per-doc date/numeric field to ``origin`` ADDS to the BM25 score as
    ``boost * pivot / (pivot + |field - origin|)`` (the documented ES
    formula; at distance 0 the boost is exactly ``boost``, at distance
    ``pivot`` it is ``boost/2``).

    ``kind='date'``: field and origin are timestamps/dates, pivot is in
    SECONDS (callers convert "7d"-style pivots). ``kind='numeric'``:
    plain doubles. (ES also supports geo_point origins; compose
    ops/geo.py:haversine_km as the distance for that case.)

    Scale shape: same as :func:`rank_feature_search` — the additive
    per-doc boost breaks WAND's upper bounds, so the match set is scored
    exhaustively and the boost arithmetic stays JVM-side in Catalyst."""
    scored = bm25_all_scores(spark, index, queries, config)
    if kind == "date":
        dist = F.abs(
            F.col(field).cast("timestamp").cast("double")
            - F.lit(origin).cast("timestamp").cast("double")
        )
    elif kind == "numeric":
        dist = F.abs(F.col(field).cast("double") - F.lit(float(origin)))
    else:
        raise ValueError(f"distance_feature_search: unknown kind {kind!r}")
    feat = F.lit(float(boost)) * F.lit(float(pivot)) / (F.lit(float(pivot)) + dist)
    rows = (
        scored.join(docs_meta.select("doc_id", field), "doc_id")
        .withColumn("score", F.col("score") + feat)
        .select("query_id", "doc_id", "score")
    )
    return _topk_window(rows, k, round_digits)


def pinned_search(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    pinned_ids: list[int],
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """ES ``pinned`` query: the given doc ids rank first IN THE SUPPLIED
    ORDER for every query (whether or not they match), then organic BM25
    results follow, with pinned docs removed from the organic section.
    Output ranks are contiguous 1..k per query, as ES serves them.

    Scale shape: the pinned list is a literal broadcast (ES caps it at 100
    ids); organic ranking rides the segment engine's normal top-k path with
    a +len(pinned) over-fetch so the post-filter cut stays exact.  The
    reorder is one bucket-cardinality window, no extra scan."""
    pins = [(int(d), i + 1) for i, d in enumerate(pinned_ids)]
    organic = bm25_segments(
        spark, index, queries, config, k=k + len(pins),
        round_digits=round_digits,
    )
    pin_df = F.broadcast(
        spark.createDataFrame(pins, "doc_id long, pin_rank long")
    )
    organic = (
        organic.join(pin_df, "doc_id", "left_anti")
        .select("query_id", "doc_id", F.lit(None).cast("long").alias("pin_rank"),
                "score")
    )
    pinned_rows = (
        queries.select("query_id")
        .crossJoin(pin_df)
        .select("query_id", "doc_id", "pin_rank",
                F.lit(None).cast("double").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.when(F.col("pin_rank").isNotNull(), 0).otherwise(1).asc(),
        F.col("pin_rank").asc_nulls_last(),
        F.col("score").desc_nulls_last(),
        F.col("doc_id").asc(),
    )
    return (
        pinned_rows.unionByName(organic)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def significant_text(
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    n: int = 5,
    filter_duplicate_text: bool = True,
) -> DataFrame:
    """ES ``significant_text`` aggregation: like ``significant_terms`` but
    computed by re-analyzing the raw text field of the matching docs, with
    the ES ``filter_duplicate_text`` option — identical texts (the
    boilerplate/mirror-page failure mode the option exists for) count ONCE
    toward both foreground and background stats, so a duplicated page
    can't masquerade as a significant signal.  JLH heuristic, top-``n``
    per query by (6-dp jlh desc, term asc).

    Scale shape: the text-dedup is one hash-groupBy keyed on a 64-bit text
    hash (first doc_id per distinct text wins — deterministic); everything
    downstream is the significant_terms plan over the surviving docs.  No
    driver state; the dedup shuffle carries (hash, doc_id), not text."""
    cfg = config or AnalyzerConfig()
    if filter_duplicate_text:
        w = Window.partitionBy(F.xxhash64("text")).orderBy(F.col("doc_id").asc())
        docs = (
            docs.withColumn("_tr", F.row_number().over(w))
            .filter(F.col("_tr") == 1)
            .drop("_tr")
        )
    return significant_terms(docs, queries, cfg, n=n)


def match_bool_prefix(
    docs: DataFrame,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
    k: int = 10,
    round_digits: int | None = None,
    max_expansions: int = 50,
) -> DataFrame:
    """ES ``match_bool_prefix`` — the query side of search-as-you-type:
    every analyzed query term except the LAST is a normal BM25 term
    clause; the last (the token still being typed) is a prefix query.
    Clauses are bool SHOULD (minimum_should_match=1): a doc matching
    any clause scores, and scores sum.  Per Lucene's multi-term rewrite
    the prefix clause is CONSTANT-SCORE (1.0 per doc matching >= 1
    expansion); the prefix expands against the index vocabulary
    lexicographically, capped at ``max_expansions``.

    Scale shape: the prefix expands against the TERM DICTIONARY (df
    table, vocabulary-sized), never the postings; the expansion list
    and the query-term list broadcast into the postings join, so the
    corpus-side work is two equi-joins + one hash agg — the same plan
    family as ``bm25_brute``.  Returns (query_id, rank, doc_id, score).
    """
    cfg = config or AnalyzerConfig()
    postings = postings_df(docs, cfg).select("term", "doc_id", "tf")
    dstats = doc_stats_df(docs, cfg)
    n_docs, avgdl = _doc_globals(dstats)
    tstats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    toks = queries.select(
        "query_id", tokenize_col("text", cfg).alias("toks")
    ).filter(F.size("toks") > 0)
    exact = toks.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0)))
            )
        ).alias("term"),
    )
    last = toks.select("query_id", F.element_at("toks", -1).alias("prefix"))

    wexp = Window.partitionBy("query_id").orderBy("term")
    expansions = (
        tstats.select("term")
        .join(F.broadcast(last), F.col("term").startswith(F.col("prefix")))
        .withColumn("_rn", F.row_number().over(wexp))
        .filter(F.col("_rn") <= max_expansions)
        .select("query_id", "term")
    )

    exact_scored = (
        F.broadcast(exact)
        .join(postings, "term")
        .join(tstats, "term")
        .join(dstats, "doc_id")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .withColumn(
            "norm",
            (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .select("query_id", "doc_id", (F.col("idf") * F.col("norm")).alias("score"))
    )
    prefix_scored = (
        F.broadcast(expansions)
        .join(postings, "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("score", F.lit(1.0))
    )
    scored = (
        exact_scored.unionByName(prefix_scored)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("score"))
    )
    return _topk_window(scored, k, round_digits)


def terms_lookup_search(
    docs: DataFrame,
    lookup_doc_id: int,
    config: AnalyzerConfig | None = None,
    k: int = 20,
) -> DataFrame:
    """ES ``terms`` query with *terms lookup*: the term list is not a
    literal but the analyzed contents of ANOTHER document (the
    "fetch the terms from doc X" contract, e.g. a user's followed-tags
    doc filtering a feed).  Filter-context semantics — no relevance
    score; we return each matching doc with ``n_matched`` (how many
    distinct lookup terms it contains), ordered (n_matched desc,
    doc_id asc), top-``k``, excluding the lookup doc itself.

    Scale shape: the lookup doc's term set is one filtered scan (a few
    hundred terms), broadcast into a single postings equi-join + hash
    agg — corpus-side work is one pass regardless of corpus size."""
    cfg = config or AnalyzerConfig()
    postings = postings_df(docs, cfg).select("term", "doc_id")
    lookup_terms = (
        postings.filter(F.col("doc_id") == lookup_doc_id).select("term").distinct()
    )
    return (
        postings.filter(F.col("doc_id") != lookup_doc_id)
        .join(F.broadcast(lookup_terms), "term")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .orderBy(F.col("n_matched").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def boosting_search(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    negatives: DataFrame,
    k: int = 10,
    negative_boost: float = 0.5,
    config: AnalyzerConfig | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """ES `boosting` query: rank by the positive query's BM25 score,
    DEMOTED (score *= negative_boost) for docs that also match the
    negative query — the negative side filters nothing and scores
    nothing, it only discounts (the ES contract; demotion must apply
    before the top-k cut, so this runs over the exhaustive positive
    match set, same reasoning as collapse/function_score).

    ``queries``/``negatives`` both carry (query_id, text); the negative
    match set is one extra doc-sharded kernel pass + a doc-keyed left
    join — no new shuffle shape."""
    pos = bm25_all_scores(spark, index, queries, config)
    neg = (
        matching_docs(spark, index, negatives, config)
        .dropDuplicates(["query_id", "doc_id"])
        .withColumn("__neg", F.lit(True))
    )
    scored = (
        pos.join(neg, ["query_id", "doc_id"], "left")
        .withColumn(
            "score",
            F.when(F.col("__neg"), F.col("score") * F.lit(float(negative_boost)))
            .otherwise(F.col("score")),
        )
        .drop("__neg")
    )
    return _topk_window(scored, k, round_digits)
