"""Percolator: reverse search — match incoming documents against a
table of STORED queries (ES percolate API: alerting, saved searches,
routing rules).

The classic index is inverted (term -> docs); percolation inverts the
other way (query terms -> queries).  Each stored query is analyzed once
into (query_id, term) rows plus its required match count; each incoming
doc's distinct terms join that query-term table and a hash aggregate
counts, per (doc, query), how many of the query's terms the doc
contains.  A query matches when the count reaches its
minimum_should_match (``"all"`` = conjunctive, 1 = disjunctive, or any
integer m).

Scale shape: docs tokenize once (one projection over the scan); the
query-term table is small by nature (10^3-10^6 saved searches), so AQE
broadcasts it into the doc-term stream — the percolation of a 10^12-doc
crawl is a map-side join + one hash aggregate keyed by (doc, query), no
per-query scans.  Catalyst end-to-end; no UDF beyond the shared
tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import AnalyzerConfig
from ..functions.udfs import tokenize_col


def analyze_stored_queries(
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Analyze stored queries (query_id, qtext, msm) into
    (query_id, term, required) rows: ``required`` is the resolved
    minimum_should_match — ``msm`` may be an int or the string 'all'
    (= every distinct analyzed term)."""
    cfg = config or AnalyzerConfig()
    toks = queries.select(
        "query_id",
        "msm",
        F.array_distinct(tokenize_col("qtext", cfg)).alias("__terms"),
    ).filter(F.size("__terms") > 0)
    # a malformed msm must FAIL, not silently become conjunctive:
    # try_cast('any') is NULL and least(NULL, n) skips NULLs, which would
    # quietly turn the author's intended semantics into match-all-terms.
    # msm may arrive int- or string-typed; normalize to string before the
    # 'all' comparison so an int column doesn't hit an implicit
    # int-vs-string cast (an error under ANSI mode).
    msm_str = F.col("msm").cast("string")
    msm_int = msm_str.try_cast("int")
    required = (
        F.when(msm_str == F.lit("all"), F.size("__terms"))
        .when(msm_int >= 1, F.least(msm_int, F.size("__terms")))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("percolate: msm must be 'all' or a positive integer, got "),
                    msm_str,
                )
            ).cast("int")
        )
    )
    return toks.select(
        "query_id",
        required.cast("int").alias("required"),
        F.explode("__terms").alias("term"),
    )


def percolate(
    spark: SparkSession,
    stored_queries: DataFrame,
    docs: DataFrame,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Match every doc (doc_id, text) against every stored query
    (query_id, qtext, msm); returns (doc_id, query_id, n_matched) for
    queries whose minimum_should_match is satisfied."""
    cfg = config or AnalyzerConfig()
    q_terms = analyze_stored_queries(stored_queries, cfg)
    d_terms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize_col("text", cfg))).alias("term")
    )
    return (
        d_terms.join(q_terms, "term")
        .groupBy("doc_id", "query_id", "required")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= F.col("required"))
        .select("doc_id", "query_id", F.col("n_matched").cast("long").alias("n_matched"))
    )
