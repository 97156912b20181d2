"""Anchor-text aggregation — the classic web-search ranking signal.

Every edge in the crawl link graph carries the linking page's anchor
string; aggregated per TARGET they describe a page better than its own
body (the original insight behind web-scale indexing: index a page
under the words others use to link to it).

Scale shape: tokenize anchors map-side, ONE shuffle on (dst, term) for
the counts, a per-dst window for top-k. Head skew (everyone links to
the same home page with "home") is bounded by the top-k cut; the
(dst, term) grouping key spreads a hot dst across partitions during the
partial aggregation. The output is a per-doc side field that joins the
body index one-to-one — a second BM25 field (see index/query.py
multi-field search) fed by other pages' words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RX = r"[^\p{L}\p{Nd}]+"


def anchor_term_counts(edges: DataFrame, dst_col: str = "dst", anchor_col: str = "anchor") -> DataFrame:
    """(src, dst, anchor) -> (dst, term, tf, n_links): per-target term
    frequencies over all in-link anchors, plus how many in-links
    contributed the term (a term repeated inside one anchor counts once
    toward n_links).

    Shape: each edge explodes its DISTINCT terms once, carrying the
    within-anchor repeat count — so n_links is a plain count(*) and tf
    a sum, with no row-identity column (monotonically_increasing_id is
    re-evaluated per generated row under a Generate, so it cannot serve
    as an edge id)."""
    terms = F.filter(
        F.split(F.lower(F.col(anchor_col)), TOKEN_SPLIT_RX), lambda t: t != ""
    )
    toks = (
        edges.select(dst_col, terms.alias("__terms"))
        .select(
            dst_col,
            "__terms",
            F.explode(F.array_distinct("__terms")).alias("term"),
        )
        .select(
            dst_col,
            "term",
            F.size(
                F.filter(F.col("__terms"), lambda t: t == F.col("term"))
            ).alias("__cnt"),
        )
    )
    return toks.groupBy(dst_col, "term").agg(
        F.sum("__cnt").alias("tf"),
        F.count("*").alias("n_links"),
    )


def top_anchor_terms(edges: DataFrame, k: int = 5, dst_col: str = "dst", anchor_col: str = "anchor") -> DataFrame:
    """Per-target top-k anchor terms ranked by in-link support
    (n_links desc, tf desc, term asc — deterministic). Returns
    (dst, term, tf, n_links, rank)."""
    counts = anchor_term_counts(edges, dst_col=dst_col, anchor_col=anchor_col)
    w = Window.partitionBy(dst_col).orderBy(
        F.col("n_links").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def anchor_field(edges: DataFrame, k: int = 16, dst_col: str = "dst", anchor_col: str = "anchor") -> DataFrame:
    """Collapse the top-k anchor terms into one synthetic text field per
    target — (dst, anchor_text, n_anchor_terms) — ready to index as an
    extra searchable field alongside the page body."""
    top = top_anchor_terms(edges, k=k, dst_col=dst_col, anchor_col=anchor_col)
    return top.groupBy(dst_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rank", "term"))
                ),
                lambda s: s["term"],
            ),
            " ",
        ).alias("anchor_text"),
        F.count("*").alias("n_anchor_terms"),
    )
