"""Distributed multinomial Naive Bayes text classifier — count-table
training, relational scoring.

McCallum & Nigam, "A Comparison of Event Models for Naive Bayes Text
Classification" (AAAI-98 workshop) — the multinomial event model that
remains the standard first-line text classifier (spam/topic/source
routing in crawl pipelines) because training IS aggregation:

    P(c)      = n_docs_c / n_docs
    P(t | c)  = (cnt(t,c) + 1) / (tokens_c + V)       (add-one)
    score(c,d)= ln P(c) + Σ_t tf(t,d) · ln P(t|c)

The model never leaves the cluster: per-class token counts and priors
are DataFrames, and the expensive per-(doc, class) sum is factored so
that ZERO-count (term, class) pairs — ln(1/(tokens_c+V)), the
overwhelming majority at web scale — never materialize:

    score(c,d) = ln P(c) − dl·ln(tokens_c + V)
                 + Σ_{t: cnt(t,c)>0} tf · ln(cnt(t,c) + 1)

so the join is the INNER (doc-term ⋈ class-term) join only, and the
dl-sized correction rides a |classes|-row broadcast.  Scale shape: two
hash aggregates to train, one key join + one (doc × classes) broadcast
to score, an argmax window partitioned by doc — no UDFs, no collected
model.  Self-classification over the training corpus (the standard
pipeline audit: confusion against the labeled column) is what
``nb_confusion`` reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(docs, id_col, text_col):
    return docs.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("term"),
    )


def nb_scores(
    docs: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (doc, class) log-joint scores: (doc_id, label, cls, score)
    — ``label`` is the doc's true class, ``cls`` the hypothesis."""
    toks = _toks(docs, id_col, text_col)
    labels = docs.select(id_col, F.col(label_col).alias("label"))
    doc_tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dstats = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    # training tables
    lt = toks.join(labels, id_col)
    class_term = lt.groupBy("label", "term").agg(
        F.count("*").alias("cnt")
    ).withColumnRenamed("label", "cls")
    class_stats = (
        lt.groupBy("label")
        .agg(F.count("*").alias("tokens_c"))
        .withColumnRenamed("label", "cls")
    )
    priors = (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_docs_c"))
        .withColumnRenamed("label", "cls")
    )
    n_docs = labels.agg(F.count("*").alias("n_docs"))
    vocab = toks.select("term").distinct().agg(F.count("*").alias("v"))
    # Σ tf·ln(cnt+1) over seen pairs only
    seen = (
        doc_tf.join(class_term, "term")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("tf") * F.log(F.col("cnt") + 1.0)).alias("s_seen"))
    )
    base = (
        dstats.crossJoin(F.broadcast(class_stats))
        .join(F.broadcast(priors), "cls")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            "cls",
            (
                F.log(F.col("n_docs_c") / F.col("n_docs"))
                - F.col("dl") * F.log(F.col("tokens_c") + F.col("v"))
            ).alias("s_base"),
        )
    )
    return (
        base.join(seen, [id_col, "cls"], "left")
        .join(labels, id_col)
        .select(
            id_col,
            "label",
            "cls",
            (F.col("s_base") + F.coalesce("s_seen", F.lit(0.0))).alias(
                "score"
            ),
        )
    )


def nb_classify(
    docs: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Per-doc argmax class: (doc_id, label, predicted, score) — ties
    broken by class name ascending (deterministic)."""
    scored = nb_scores(docs, label_col, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), round_digits).desc(), F.col("cls").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            "label",
            F.col("cls").alias("predicted"),
            F.round("score", round_digits).alias("score"),
        )
    )


def nb_confusion(
    docs: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-classification confusion matrix over the labeled corpus:
    (label, predicted, n_docs) — the training-pipeline routing audit."""
    return (
        nb_classify(docs, label_col, id_col, text_col)
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def nb_learning_curve(
    docs: DataFrame,
    fracs=(0.25, 0.5, 1.0),
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Naive-Bayes sample-efficiency curve — held-out accuracy vs
    training-set size.

    The learning-curve protocol (Banko & Brill, ACL 2001 — the "more
    data beats better algorithms" plot) on the count-based classifier
    above: a FIXED 20% holdout (doc_id % 5 == 4), training subsets of
    the remaining pool at each fraction (doc_id % 4 < frac*4 — nested,
    so each larger set contains the smaller), model = multinomial NB
    with the same ln(cnt+1)/ln(tokens_c + V) smoothing as
    ``nb_scores``, V = the TRAINING vocabulary.  Because training is
    pure counting, every point of the curve is one more filtered
    aggregation — no iterative fitting anywhere.

    Per fraction: (train_frac, n_train, n_test, accuracy).
    """
    from pyspark.sql import Window

    test = docs.filter(F.col(id_col) % 5 == 4)
    pool = docs.filter(F.col(id_col) % 5 != 4)
    t_toks = _toks(test, id_col, text_col)
    t_tf = t_toks.groupBy(id_col, "term").agg(
        F.count("*").alias("tf")
    )
    t_dl = t_toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    t_lab = test.select(id_col, F.col(label_col).alias("label"))
    n_test = test.count()
    out = None
    for frac in fracs:
        train = pool.filter(F.col(id_col) % 4 < int(frac * 4))
        n_train = train.count()
        tr_toks = _toks(train, id_col, text_col)
        labels = train.select(id_col, F.col(label_col).alias("label"))
        lt = tr_toks.join(labels, id_col)
        class_term = lt.groupBy("label", "term").agg(
            F.count("*").alias("cnt")
        ).withColumnRenamed("label", "cls")
        class_stats = lt.groupBy("label").agg(
            F.count("*").alias("tokens_c")
        ).withColumnRenamed("label", "cls")
        priors = labels.groupBy("label").agg(
            F.count("*").alias("n_docs_c")
        ).withColumnRenamed("label", "cls")
        nd = labels.agg(F.count("*").alias("n_docs"))
        voc = tr_toks.select("term").distinct().agg(
            F.count("*").alias("v")
        )
        seen = (
            t_tf.join(class_term, "term")
            .groupBy(id_col, "cls")
            .agg(
                F.sum(
                    F.col("tf") * F.log(F.col("cnt") + 1.0)
                ).alias("s_seen")
            )
        )
        base = (
            t_dl.crossJoin(F.broadcast(class_stats))
            .join(F.broadcast(priors), "cls")
            .crossJoin(F.broadcast(nd))
            .crossJoin(F.broadcast(voc))
            .select(
                id_col,
                "cls",
                (
                    F.log(
                        F.col("n_docs_c")
                        / F.col("n_docs").cast("double")
                    )
                    - F.col("dl")
                    * F.log(F.col("tokens_c") + F.col("v"))
                ).alias("s_base"),
            )
        )
        sc = (
            base.join(seen, [id_col, "cls"], "left")
            .na.fill({"s_seen": 0.0})
            .withColumn(
                "score", F.col("s_base") + F.col("s_seen")
            )
            .join(t_lab, id_col)
        )
        w = Window.partitionBy(id_col).orderBy(
            F.round("score", 4).desc(), F.col("cls").asc()
        )
        pred = sc.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        acc = pred.agg(
            F.sum(
                (F.col("cls") == F.col("label")).cast("long")
            ).alias("ok"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        row = docs.sparkSession.createDataFrame(
            [
                (
                    float(frac),
                    n_train,
                    n_test,
                    round(acc.ok / acc.n, round_digits)
                    if acc.n
                    else 0.0,
                )
            ],
            "train_frac double, n_train long, n_test long, "
            "accuracy double",
        )
        out = row if out is None else out.unionByName(row)
    return out
