"""xQuAD — explicit query aspect diversification of a retrieval run.

Santos, Macdonald & Ounis, "Exploiting query reformulations for web
result diversification" (WWW 2010): re-rank the top of a retrieval
run so the selected set covers the query's ASPECTS, greedily picking
at each step the document maximizing

    (1 - lambda) * P(d|q)
      + lambda * sum_a P(a|q) * P(d|a) * prod_{d' in S} (1 - P(d'|a))

— relevance mixed with aspect gain discounted by how well the
already-selected set S covers each aspect.  This implementation uses
a BINARY aspect model (each candidate belongs to exactly one aspect,
its ``source`` field; P(d|a) = 1 iff d's aspect is a), so the product
term collapses to an indicator — the aspect contributes only until a
document of that aspect is selected — and the whole greedy trace is
expressible as plain unrolled relational algebra, which is what the
DuckDB oracle replays CTE-level by CTE-level.  P(d|q) is the
candidate's normalized retrieval score, P(a|q) the aspect's share of
the candidate pool (the paper's uniform-over-observed-aspects prior,
weighted by presence).

Contrast with MMR (``ops/similarity.py:mmr_rerank``): MMR diversifies
implicitly via pairwise document similarity (not SQL-expressible —
rows-only); xQuAD's explicit aspects keep the greedy loop relational
and oracle-checkable.

Scale shape: candidate generation is the ordinary distributed scoring
join; the greedy loop runs inside one Arrow batch PER QUERY via
applyInPandas — queries are the fan-out unit, each group is k-deep
over <= n_candidates rows, no driver loop, no cross-query state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _candidates(
    docs: DataFrame,
    queries: DataFrame,
    n_candidates: int,
    text_col: str,
    id_col: str,
    aspect_col: str,
) -> DataFrame:
    """Per query: top-``n_candidates`` docs by the ln(1+tf)*ln(N/df)
    score with normalized relevance and aspect priors."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.col(id_col)).distinct().count()
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    ).distinct()
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(df_t, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(F.lit(1.0) + F.col("tf"))
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    cand = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_candidates)
        .join(
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.col(aspect_col).alias("aspect"),
            ),
            "doc_id",
        )
    )
    qa = cand.groupBy("query_id").agg(
        F.sum("score").alias("score_sum"), F.count(F.lit(1)).alias("n_cand")
    )
    pa = cand.groupBy("query_id", "aspect").agg(
        F.count(F.lit(1)).alias("n_aspect")
    )
    return (
        cand.join(F.broadcast(qa), "query_id")
        .join(F.broadcast(pa), ["query_id", "aspect"])
        .select(
            "query_id",
            "doc_id",
            "aspect",
            F.when(
                F.col("score_sum") != 0,
                F.col("score") / F.col("score_sum"),
            )
            .otherwise(F.lit(0.0))
            .alias("rel"),
            (F.col("n_aspect") / F.col("n_cand")).alias("p_aspect"),
        )
    )


def xquad_rerank(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    n_candidates: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    aspect_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, rank, doc_id, aspect, gain): the xQuAD greedy top-k
    per query under the binary aspect model; ``gain`` is the selection
    objective at pick time, rounded before the argmax so Spark and the
    oracle break ties identically (then by doc_id asc)."""
    cand = _candidates(
        docs, queries, n_candidates, text_col, id_col, aspect_col
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        chosen = []
        covered: set[str] = set()
        remaining = pdf.to_dict("records")
        for rank in range(1, min(k, len(remaining)) + 1):
            best = None
            for r in remaining:
                novelty = 0.0 if r["aspect"] in covered else 1.0
                gain = round(
                    (1.0 - lam) * r["rel"]
                    + lam * r["p_aspect"] * novelty,
                    round_digits,
                )
                if best is None or (gain, -r["doc_id"]) > (
                    best[0],
                    -best[1]["doc_id"],
                ):
                    best = (gain, r)
            chosen.append(
                {
                    "query_id": best[1]["query_id"],
                    "rank": rank,
                    "doc_id": best[1]["doc_id"],
                    "aspect": best[1]["aspect"],
                    "gain": best[0],
                }
            )
            covered.add(best[1]["aspect"])
            remaining = [
                r for r in remaining if r["doc_id"] != best[1]["doc_id"]
            ]
        return pd.DataFrame(
            chosen,
            columns=["query_id", "rank", "doc_id", "aspect", "gain"],
        )

    return cand.groupBy("query_id").applyInPandas(
        kernel,
        "query_id long, rank int, doc_id long, aspect string, gain double",
    )
