"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a (small, high-quality) target corpus.

The published recipe, re-expressed relationally:

1. Featurize every document as hashed unigram+bigram counts over B
   buckets (the paper's 10k-bucket bag-of-hashed-ngrams).
2. Fit two smoothed categorical distributions over the buckets — target
   ``p`` and raw ``q`` (add-``alpha`` smoothing over all B buckets).
3. A document's log importance weight is ``sum over its n-grams of
   ln(p[bucket]/q[bucket])`` — the bag-of-ngrams log-likelihood ratio.
4. Resample the raw corpus by weight. The paper adds Gumbel noise for a
   soft sample; the deterministic top-k by weight is the reproducible
   variant implemented here (callers can add noise before ranking).

Scale shape (the point of doing this in Spark): featurization is one
explode over tokens (map-side); both distributions are ONE hash
aggregate down to <= B rows each; the log-ratio table is bucket-
cardinality and broadcasts into the scoring join, so scoring 10^12 raw
documents is a map-side join + per-doc partial-agg sum — no shuffle
carries anything wider than (doc_id, bucket). Nothing is collected to
the driver.

Hashing: bucket = first-8-hex-chars of md5(gram) mod B. md5 is exact
and identical in every engine (Spark ``md5``/``conv``, DuckDB
``md5``/hex cast), which keeps the whole pipeline value-checkable
against a SQL oracle — a property xxhash-style seeds don't give across
engines. At 100 TB the md5-per-gram cost is map-side CPU inside
whole-stage codegen; swap in ``xxhash64 % B`` when cross-engine
checkability is not required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """(doc_id, bucket) — one row per n-gram OCCURRENCE (not distinct),
    unigrams plus (optionally) space-joined word bigrams, hashed into
    ``n_buckets`` via md5. Pure Catalyst: split, zip_with, explode,
    conv — no Python workers."""
    toks = _tokens(text_col)
    grams = toks
    if bigrams:
        big = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        grams = F.concat(toks, big)
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return (
        docs.select(F.col(doc_col).alias("doc_id"), F.explode(grams).alias("gram"))
        .select("doc_id", bucket.alias("bucket"))
    )


def dsir_log_ratio(
    raw_feats: DataFrame,
    target_feats: DataFrame,
    n_buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, log_ratio): ``ln p_target(bucket) - ln q_raw(bucket)``
    with add-``alpha`` smoothing over all ``n_buckets`` buckets —
    ``p[b] = (c[b] + alpha) / (total + alpha * B)``. Buckets unseen in
    one corpus get the smoothed floor (full-outer join + coalesce).
    Output is <= ``n_buckets`` rows: broadcast it into the scoring
    join."""
    tc = target_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    rc = raw_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    tot_t = target_feats.agg(F.count(F.lit(1)).alias("n_t"))
    tot_r = raw_feats.agg(F.count(F.lit(1)).alias("n_r"))
    a, b = F.lit(float(alpha)), F.lit(float(n_buckets))
    return (
        tc.join(rc, "bucket", "full_outer")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("c_t"), F.lit(0)) + a) / (F.col("n_t") + a * b))
                - F.log((F.coalesce(F.col("c_r"), F.lit(0)) + a) / (F.col("n_r") + a * b))
            ).alias("log_ratio"),
        )
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    doc_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = True,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """End-to-end DSIR: featurize, fit target-vs-raw log ratios, score
    every NON-target document, return the top-``k`` by (rounded log
    weight desc, doc_id asc) with rank. ``is_target`` is a boolean
    Column over ``docs`` marking the target corpus; the raw/selection
    pool is everything else (the paper scores the raw web corpus
    against the target distribution).

    The returned frame carries ``n_grams`` and ``avg_log_ratio`` too —
    the per-gram average is the length-debiased variant some DSIR
    deployments rank on."""
    flagged = docs.withColumn("_is_target", is_target)
    feats = hashed_ngram_features(
        flagged, text_col, doc_col, n_buckets, bigrams
    ).join(
        flagged.select(F.col(doc_col).alias("doc_id"), "_is_target"), "doc_id"
    )
    target_feats = feats.filter(F.col("_is_target")).select("doc_id", "bucket")
    raw_feats = feats.filter(~F.col("_is_target")).select("doc_id", "bucket")
    ratio = dsir_log_ratio(raw_feats, target_feats, n_buckets, alpha)
    scored = (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("log_ratio"), round_digits).alias("log_w"),
            F.round(F.avg("log_ratio"), round_digits).alias("avg_log_ratio"),
        )
    )
    # distributed top-k (TakeOrderedAndProject — per-partition heaps, no
    # global sort), THEN rank the k survivors with a window over k rows
    top = scored.orderBy(F.col("log_w").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("log_w").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "n_grams", "log_w", "avg_log_ratio")
    )


def moore_lewis_scores(
    docs: DataFrame,
    in_domain,
    alpha: float = 0.5,
    k: int = 20,
    text_col: str = "text",
    doc_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Moore-Lewis cross-entropy-difference data selection (Moore &
    Lewis, "Intelligent Selection of Language Model Training Data",
    ACL 2010) — the classic predecessor of DSIR above: score each
    out-of-domain candidate by

        score(d) = H_I(d) - H_G(d)
                 = (1/|d|) * sum_w [ ln p_G(w) - ln p_I(w) ]

    where p_I / p_G are add-``alpha``-smoothed unigram LMs fit on the
    in-domain seed (rows matching the ``in_domain`` predicate) and the
    general pool (the rest), over the shared corpus vocabulary.  LOWER
    is better (the doc looks in-domain relative to its pool), so the
    deterministic selection is the ``k`` lowest scores
    (ties: score asc at round_digits, doc_id asc).

    Scale shape: exactly DSIR's — two vocab-sized count aggregates,
    the per-term log-ratio table broadcasts into one map-side token
    join, one per-doc partial-agg mean.  Nothing driver-side.
    """
    toks = docs.select(
        doc_col,
        F.col(text_col),
        in_domain.alias("is_in"),
    ).select(
        doc_col, "is_in", F.explode(_tokens(text_col)).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.col("is_in").cast("long")).alias("c_in"),
        F.sum((~F.col("is_in")).cast("long")).alias("c_gen"),
    )
    tot = counts.agg(
        F.sum("c_in").alias("n_in"),
        F.sum("c_gen").alias("n_gen"),
        F.count(F.lit(1)).alias("v"),
    )
    ratio = counts.crossJoin(F.broadcast(tot)).select(
        "term",
        (
            F.log(
                (F.col("c_gen") + alpha)
                / (F.col("n_gen") + alpha * F.col("v"))
            )
            - F.log(
                (F.col("c_in") + alpha)
                / (F.col("n_in") + alpha * F.col("v"))
            )
        ).alias("log_ratio"),
    )
    scored = (
        toks.filter(~F.col("is_in"))
        .join(ratio, "term")
        .groupBy(doc_col)
        .agg(F.avg("log_ratio").alias("score"))
    )
    w = Window.orderBy(
        F.round("score", round_digits).asc(), F.col(doc_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "rank", doc_col, F.round("score", round_digits).alias("score")
        )
    )
