"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything here is pure Catalyst expressions (whole-stage codegen, no
Python) so each has a straightforward DuckDB-oracle twin."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "for", "on", "with", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "los"],
    "de": ["der", "die", "das", "und", "in", "zu", "den", "ist", "von", "mit", "für", "auf"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "est", "que", "pour"],
}

# BPE-ish word/number/punct pieces: letters+digits runs or single punct
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != F.lit(""))


# adjacent-bigram generator over a `toks` array column; sequence(1, 0)
# counts DOWN in Spark, so sub-2-token docs are guarded to empty
_BIGRAM_EXPR = (
    "CASE WHEN size(toks) < 2 THEN array() "
    "ELSE transform(sequence(1, size(toks) - 1), "
    "i -> struct(toks[i-1] AS w1, toks[i] AS w2)) END"
)


def lang_scores(text_col: Column) -> list[tuple[str, Column]]:
    toks = _tokens(text_col)
    out = []
    for lang, stops in STOPWORDS.items():
        hits = F.size(
            F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in stops]))
        )
        out.append((lang, hits / F.greatest(F.size(toks), F.lit(1))))
    return out


def detect_language(text_col: Column) -> Column:
    """Stopword-ratio n-gram-free heuristic language ID: argmax over the
    per-language stopword hit ratio; 'und' (undetermined) when all zero."""
    scores = lang_scores(text_col)
    pairs = F.array(
        *[F.struct(score.alias("score"), F.lit(lang).alias("lang")) for lang, score in scores]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score in [0, 1]."""
    toks = _tokens(F.col(text_col))
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    mean_tok_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_toks,
    ).otherwise(F.lit(0.0))
    punct_chars = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[!-/:-@\[-`{-~]", ""))
    punct_ratio = F.when(n_chars > 0, punct_chars.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS["en"]])))
    stop_ratio = F.when(n_toks > 0, stop_hits.cast("double") / n_toks).otherwise(F.lit(0.0))
    uniq_ratio = F.when(
        n_toks > 0, F.size(F.array_distinct(toks)).cast("double") / n_toks
    ).otherwise(F.lit(0.0))
    score = (
        F.least(n_toks.cast("double") / 32.0, F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.25
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.25
        + uniq_ratio * 0.25
    )
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(uniq_ratio, 4).alias("unique_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex piece count per doc."""
    ws = F.size(_tokens(F.col(text_col)))
    bpe = F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/quality signals for web-text filtering
    (Rae et al. 2021 §A1.1 heuristics, the standard LLM-corpus cleanup
    set): duplicate-line fraction, bullet/ellipsis line fractions,
    symbol-to-char ratio, and the fraction of tokens covered by the most
    frequent word 2-gram. Line metrics are pure Catalyst; the top-2-gram
    metric is relational (explode -> count -> max) so Catalyst picks
    partial aggregation — no UDFs anywhere, and every expression has an
    exact DuckDB oracle twin."""
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: l != F.lit(""))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    trimmed = F.transform(lines, lambda l: F.trim(l))
    dup_line_frac = (
        (F.size(lines) - F.size(F.array_distinct(trimmed))) / n_lines
    )
    bullet_frac = (
        F.size(F.filter(trimmed, lambda l: l.rlike(r"^[-*•]"))) / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(trimmed, lambda l: l.rlike(r"(\.\.\.|…)$"))) / n_lines
    )
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    symbol_ratio = F.regexp_count(F.col(text_col), F.lit(r"[#@~^|\\]")) / n_chars

    base = docs.select(
        "doc_id",
        F.round(dup_line_frac, 4).alias("dup_line_frac"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
    )

    toks = docs.select("doc_id", _tokens(F.col(text_col)).alias("toks"))
    grams = toks.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(" ", F.col("toks")[i - 1], F.col("toks")[i]),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    top2 = (
        grams.groupBy("doc_id", "n_toks", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            # tokens covered by the modal 2-gram: 2 * max count, capped
            F.round(
                F.least(
                    F.max("c") * 2.0 / F.greatest(F.first("n_toks"), F.lit(1)),
                    F.lit(1.0),
                ),
                4,
            ).alias("top_2gram_frac")
        )
    )
    return base.join(top2, "doc_id", "left").fillna({"top_2gram_frac": 0.0})


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    lowercased token list — the canonical near-dup 'shingleprint'."""
    toks = F.array_sort(F.array_distinct(_tokens(F.col(text_col))))
    return docs.select(
        "doc_id",
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
        F.size(toks).alias("n_distinct_tokens"),
    )


def tfidf_keywords(
    docs: DataFrame, top_n: int = 5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, rank, term, tf, score): per-doc top-``top_n`` distinctive
    terms by tf*idf — idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (same
    Robertson idf as BM25 scoring), ranked on the 6-dp-rounded product
    (ties term asc) so an external oracle reproduces the cut exactly.

    Scale shape: one (doc_id, term) partial-agg shuffle for tf, one
    term-keyed aggregate for df (partial agg flattens head terms), a
    term-keyed shuffle join, and a doc-keyed window — every stage
    key-partitioned, no driver state, no UDF."""
    toks = (
        docs.select("doc_id", F.explode(_tokens(F.col(text_col))).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select("doc_id").distinct().count()
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = tf.join(df, "term").withColumn(
        "score", F.round(F.col("tf") * idf, 6)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "rank", "term", "tf", "score")
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """(rank, bigram, n_pair, pmi): corpus-level collocation mining —
    adjacent-token bigrams scored by pointwise mutual information
    PMI = ln( (c_ab/B) / ((c_a/T)^2-normalized unigram probs) ), i.e.
    ln(P(ab) / (P(a)·P(b))) with P(ab)=c_ab/B over B total bigrams and
    P(w)=c_w/T over T total tokens (Church & Hanks 1990). Bigrams below
    ``min_count`` are dropped (the standard low-count PMI guard); top
    ``top_n`` by (4-dp-rounded pmi desc, bigram asc).

    Scale shape: bigrams are generated per-row with an array lambda (no
    self-join); one bigram-keyed and one unigram-keyed partial-agg
    shuffle; the global totals are single-row aggregates broadcast by
    crossJoin. The final top-n is a tiny post-filter sort."""
    toks = docs.select(_tokens(F.col(text_col)).alias("toks"))
    big = toks.select(F.explode(F.expr(_BIGRAM_EXPR)).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    uni = toks.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c_w")
    )
    pair = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    totals = pair.agg(F.sum("n_pair").alias("n_bigrams")).crossJoin(
        uni.agg(F.sum("c_w").alias("n_tokens"))
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair") / F.col("n_bigrams"))
            / ((F.col("c1") / F.col("n_tokens")) * (F.col("c2") / F.col("n_tokens")))
        ),
        4,
    )
    scored = (
        pair.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "n_pair",
            pmi.alias("pmi"),
        )
    )
    from pyspark.sql import Window

    # global top-n via orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-n, driver merge) — NOT an unpartitioned window, which
    # would shuffle every distinct bigram to one task; the rank window
    # then runs over <= top_n rows only.
    top = scored.orderBy(F.col("pmi").desc(), F.col("bigram").asc()).limit(top_n)
    w = Window.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "bigram", "n_pair", "pmi"
    )


def _doc_bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — adjacent-token bigrams generated per-row with
    an array lambda (no self-join, no positional explode+join)."""
    return docs.select(
        "doc_id", _tokens(F.col(text_col)).alias("toks")
    ).select(
        "doc_id", F.explode(F.expr(_BIGRAM_EXPR)).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_lm_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    alpha: float = 0.1,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """(doc_id, n_bigrams, ppl): per-document perplexity under a
    corpus-trained bigram language model with add-α smoothing — the
    CCNet-style LM quality filter (Wenzek et al. 2020 rank crawl text by
    LM perplexity; they use a pretrained KenLM 5-gram, we train a bigram
    model on ``model_docs`` so the whole pipeline is self-contained and
    engine-reproducible):

        P(b|a)  = (c_ab + α) / (c_a + α·V)      V = model vocab size
        ppl(d)  = exp( -avg_{(a,b) ∈ d} ln P(b|a) )

    Low ppl = text the corpus LM predicts well (fluent/common); high
    ppl = boilerplate, gibberish, or out-of-domain — the filter axis.
    Docs with < 2 tokens have no bigrams and are absent (no LM evidence).
    Unseen bigrams/unigrams at score time (model_docs ≠ docs) fall back
    to the α-smoothed floor via left joins.

    Scale shape: counts are partial-agg shuffles; scoring joins the doc
    bigram stream against the bigram/unigram count tables on their keys
    (large-large, AQE handles the "of the" head-pair skew) — no
    collected model, no UDF, whole-stage codegen end to end."""
    model = model_docs if model_docs is not None else docs
    mtoks = model.select(F.explode(_tokens(F.col(text_col))).alias("w"))
    uni = mtoks.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    pairs = (
        _doc_bigrams(model, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    # vocab size V stays IN the plan (one-row cross join) — an eager
    # uni.count() here would run the whole upstream lineage once at
    # call time and again at execution
    vdf = uni.agg(F.count(F.lit(1)).alias("_v"))

    logp = F.log(
        (F.coalesce(F.col("c_ab"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c_w"), F.lit(0)) + F.lit(alpha) * F.col("_v"))
    )
    return (
        _doc_bigrams(docs, text_col)
        .join(pairs, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vdf))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(-F.avg(logp)), round_digits).alias("ppl"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    line_sep: str = "\n",
    out_col: str = "cleaned",
) -> DataFrame:
    """(doc_id, <out_col>): strip lines that repeat across >= ``min_df``
    distinct documents — the CCNet/RefinedWeb line-level boilerplate
    filter (cookie banners, nav menus, footers repeat verbatim across a
    site's pages; real content lines don't).

    Scale shape: one groupBy computes line→doc-frequency (partial aggs
    flatten the head-line skew); the boilerplate set (lines with
    df >= min_df) is orders of magnitude smaller than the corpus, and the
    left_anti join against it lets AQE broadcast when small. Reassembly
    re-aggregates surviving lines ordered by original position. Docs
    whose every line is boilerplate are kept with an empty string.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            line_sep,
        ).alias(out_col)
    )
    return (
        docs.select("doc_id")
        .join(reassembled, "doc_id", "left")
        .select("doc_id", F.coalesce(out_col, F.lit("")).alias(out_col))
    )


# GPT-2-family pre-tokenizer split, restricted to RE2-safe constructs so
# the same pattern is runnable by Spark (Java regex) AND the DuckDB oracle
# (RE2): letter runs, digit runs, and punctuation runs, each with an
# optional single leading space. (The full GPT-2 pattern adds contraction
# special-cases and a trailing-space lookahead; those need backtracking
# engines, so the boundary is documented here instead of hidden.)
BPE_PRETOKEN_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_pretokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LLM token-budget accounting: split text with the GPT-2-style
    pre-tokenizer regex and return (doc_id, n_pretokens, n_distinct,
    chars_per_pretoken). This is the pre-BPE unit count every training-
    data pipeline budgets with (BPE merges only ever split WITHIN these
    units, so n_pretokens lower-bounds and tracks the BPE token count).

    Scale shape: ``regexp_extract_all`` + ``explode`` run JVM-side in
    whole-stage codegen; the aggregate is per-doc (map-side combinable).
    """
    toks = docs.select(
        "doc_id",
        # pattern passed as a literal Column, NOT through F.expr — the SQL
        # parser would eat the \s escape inside the string literal
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))
        ).alias("pt"),
    )
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_pretokens"),
        F.countDistinct("pt").alias("n_distinct"),
        F.round(F.sum(F.length("pt")) / F.count(F.lit(1)), 4).alias(
            "chars_per_pretoken"
        ),
    )


def ccnet_perplexity_buckets(docs: DataFrame, alpha: float = 0.1) -> DataFrame:
    """CCNet-style quality tiers (Wenzek et al. 2020): per-doc LM
    perplexity (bigram_lm_perplexity) split into head / middle / tail at
    the exact 1/3 and 2/3 perplexity quantiles — lowest-perplexity third
    is "head", the pretraining-preferred slice.

    Scale note: the cutoffs are ONE two-value aggregate over the ppl
    column (exact percentile here for oracle parity; swap to
    percentile_approx at 10^12 docs — same plan shape, bounded memory),
    then bucketing is a map-side CASE. No global sort / ntile window.
    """
    ppl = bigram_lm_perplexity(docs, alpha=alpha)
    cuts = ppl.agg(
        F.expr("percentile(ppl, array(1.0D/3.0D, 2.0D/3.0D))").alias("c")
    ).first()["c"]
    c1, c2 = float(cuts[0]), float(cuts[1])
    bucket = (
        F.when(F.col("ppl") <= c1, F.lit("head"))
        .when(F.col("ppl") <= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ppl.select("doc_id", "ppl", bucket.alias("bucket"))


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
    round_digits: int = 4,
) -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: least-squares
    slope of ln(freq) on ln(rank) across the ``top_n`` most frequent
    terms (a healthy natural-language corpus sits near slope -1; a
    spam/boilerplate-heavy crawl flattens or steepens it — a corpus-level
    quality gate).

    Scale shape: ONE (term) count aggregate over the corpus, a top-n cut
    (the only window runs over <= top_n rows after an orderBy-limit on
    the aggregated vocabulary — vocabulary-bounded, never corpus-
    bounded), then closed-form OLS via covariance/variance aggregates.
    Returns one row: (n_terms, slope, intercept)."""
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z']+"), lambda t: t != ""
            )
        ).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("freq"))
    top = counts.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(top_n)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("term").asc())
        ),
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), round_digits).alias("slope"),
        F.round(
            F.avg("y") - (F.covar_pop("x", "y") / F.var_pop("x")) * F.avg("x"),
            round_digits,
        ).alias("intercept"),
    )


# adjacent-trigram generator; sub-3-token docs guarded to empty
_TRIGRAM_EXPR = (
    "CASE WHEN size(toks) < 3 THEN array() "
    "ELSE transform(sequence(2, size(toks) - 1), "
    "i -> struct(toks[i-2] AS w1, toks[i-1] AS w2, toks[i] AS w3)) END"
)


def _doc_trigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2, w3) — adjacent trigrams generated per-row with
    an array lambda (no self-joins on a positional explode)."""
    return (
        docs.select("doc_id", _tokens(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode(F.expr(_TRIGRAM_EXPR)).alias("tg"))
        .select(
            "doc_id",
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
    )


def stupid_backoff_scores(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """(doc_id, n_trigrams, sb_ppl): per-document perplexity-style
    score under a trigram **Stupid Backoff** model (Brants, Popat, Xu,
    Och & Dean, "Large Language Models in Machine Translation",
    EMNLP 2007) — the smoothing designed FOR distributed count-table
    LMs: no discounting, no normalization, just relative frequencies
    with a fixed backoff penalty, which is exactly what keeps the model
    a set of joinable count relations instead of a trained artifact:

        S(w3 | w1 w2) = c(w1w2w3) / c(w1w2)           if seen
                      = α · c(w2w3) / c(w2)           elif bigram seen
                      = α² · c(w3) / N                elif unigram seen
                      = α³ / N                        else (OOV floor)

    with Brants' α = 0.4. sb_ppl = exp(-avg ln S) over the doc's
    trigrams (lower = better predicted). S is a score, not a
    probability (it does not sum to 1) — the paper's deliberate trade;
    at web scale it matches Kneser-Ney quality while training with
    counts only.

    Docs with < 3 tokens have no trigrams and are absent. Train on
    ``model_docs`` (default: ``docs`` itself — then the backoff tiers
    are never reached; pass a held-out split to exercise them).

    Scale shape: three count shuffles build the model relations; the
    scoring pass joins the doc trigram stream against them on their
    keys (large-large, AQE skew-handles head n-grams) — no collected
    model, no UDF, whole-stage codegen end to end."""
    model = model_docs if model_docs is not None else docs
    mtoks = model.select(F.explode(_tokens(F.col(text_col))).alias("w"))
    uni = mtoks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    big = (
        _doc_bigrams(model, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tri = (
        _doc_trigrams(model, text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    # total token count stays IN the plan (one-row broadcast)
    ndf = mtoks.agg(F.count(F.lit(1)).alias("_n"))

    a = F.lit(float(alpha))
    s = (
        F.when(
            F.col("c3").isNotNull(), F.col("c3") / F.col("c2ctx")
        )
        .when(F.col("c23").isNotNull(), a * F.col("c23") / F.col("c2uni"))
        .when(F.col("c1w3").isNotNull(), a * a * F.col("c1w3") / F.col("_n"))
        .otherwise(a * a * a / F.col("_n"))
    )
    return (
        _doc_trigrams(docs, text_col)
        .join(tri, ["w1", "w2", "w3"], "left")
        .join(
            big.select(
                F.col("w1"), F.col("w2"), F.col("c2").alias("c2ctx")
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            big.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c2").alias("c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("c2uni")),
            "w2",
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w3"), F.col("c1").alias("c1w3")),
            "w3",
            "left",
        )
        .crossJoin(F.broadcast(ndf))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.exp(-F.avg(F.log(s))), round_digits).alias("sb_ppl"),
        )
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    n_iter: int = 5,
    damping: float = 0.85,
    top_n: int = 20,
    min_len: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau,
    "TextRank: Bringing Order into Texts", EMNLP 2004): a weighted
    undirected co-occurrence graph over adjacent content tokens
    (stopwords and tokens shorter than ``min_len`` dropped; edge weight
    = corpus co-occurrence count, symmetrized), ranked with the
    weighted PageRank recurrence — graph centrality instead of
    tf·idf's frequency contrast, so terms that CONNECT the vocabulary
    rank high even at modest frequency. Returns the top ``top_n``
    (rank, term, score) by (rounded score desc, term asc).

    Scale shape: bigram generation is per-row array lambdas; the graph
    build is one hash aggregate; each iteration is the standard
    two-shuffle weighted-PageRank step over a vocabulary-sized (not
    corpus-sized) edge list."""
    from pyspark.sql import Window

    from tokenkit_spark.ops.linkgraph import weighted_pagerank

    stops = STOPWORDS["en"]
    keep = lambda c: (~F.col(c).isin(*stops)) & (F.length(F.col(c)) >= min_len)
    pairs = (
        _doc_bigrams(docs, text_col)
        .filter(keep("w1") & keep("w2") & (F.col("w1") != F.col("w2")))
        .select("w1", "w2")
    )
    und = pairs.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst")
    ).unionAll(pairs.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
    wedges = und.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )
    pr = weighted_pagerank(wedges, n_iter, damping, round_digits)
    top = pr.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(top_n)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("node").alias("term"),
        F.col("pr").alias("score"),
    )


def kneser_ney_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    discount: float = 0.75,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """(doc_id, n_bigrams, kn_ppl): per-document perplexity under an
    interpolated Kneser-Ney bigram model (Kneser & Ney, ICASSP 1995;
    the interpolated form and D=0.75 per Chen & Goodman, "An Empirical
    Study of Smoothing Techniques for Language Modeling", 1998):

        P(w2|w1) = max(c(w1w2) - D, 0)/c(w1)
                   + D·T(w1)/c(w1) · P_cont(w2)

    where T(w1) = |{w: c(w1 w) > 0}| (distinct continuations of w1)
    and P_cont(w2) is the CONTINUATION probability — how many distinct
    contexts w2 completes, not how often it occurs:

        P_cont(w2) = (N1+(·w2) + 1) / (N1+(··) + V + 1)

    (+1/+V+1 is an add-one floor on the continuation distribution so
    held-out OOV tokens score finitely — the documented deviation from
    the textbook form, which is undefined for unseen w2). Unseen
    contexts (c(w1) = 0) back off entirely to P_cont(w2).

    This is the smoothing that fixes "San Francisco": 'francisco' is
    frequent but only ever follows 'san', so its continuation count —
    and hence its probability after a NOVEL context — is tiny, where
    add-α or stupid backoff would overrate it by raw frequency.

    Scale shape: four count relations (bigram, unigram, continuation-
    left, type totals) built with hash aggregates; scoring joins the
    doc bigram stream against them on their keys — no collected model,
    no UDF."""
    model = model_docs if model_docs is not None else docs
    big = (
        _doc_bigrams(model, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    # context totals c(w1) and distinct-continuation counts T(w1)
    ctx = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("t1")
    )
    # continuation counts N1+(.w2) per w2; N1+(..) total bigram types; V
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left"))
    totals = big.agg(F.count(F.lit(1)).alias("n_types")).crossJoin(
        model.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )

    d = F.lit(float(discount))
    p_cont = (F.coalesce(F.col("n_left"), F.lit(0)) + 1.0) / (
        F.col("n_types") + F.col("v") + 1.0
    )
    p = F.when(
        F.col("c1").isNotNull(),
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - d, F.lit(0.0))
        / F.col("c1")
        + d * F.col("t1") / F.col("c1") * p_cont,
    ).otherwise(p_cont)
    return (
        _doc_bigrams(docs, text_col)
        .join(big, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(-F.avg(F.log(p))), round_digits).alias("kn_ppl"),
        )
    )


def heaps_fit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: V(T) = K · T^beta, estimated by
    OLS of ln V on ln T over per-document checkpoints, where T is the
    running token count and V the running distinct-vocabulary size in
    ``id_col`` order (Heaps 1978; beta ~ 0.4-0.6 for natural text — a
    crawl whose beta collapses toward 0 is template-dominated, toward 1
    is junk/UUID-dominated; the twin corpus gate to zipf_fit, and the
    sizing law for term-dictionary capacity planning at 10^12 docs).

    Scale shape: one tokenize pass; vocabulary first-occurrence via a
    per-term MIN aggregate; both running sums are per-document
    cumulatives in one ordered window over the doc-count-sized relation
    (at web scale, checkpoint on a doc-id sample instead of every doc —
    the estimator only needs O(100) points; the window itself
    partitions by range at cluster scale). Returns one row:
    (n_points, t_total, v_total, beta, ln_k, r2)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z']+"), lambda t: t != ""
            )
        ).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    new_terms = (
        toks.groupBy("term")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("new_terms"))
    )
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        dl.join(new_terms, id_col, "left")
        .fillna(0, subset=["new_terms"])
        .select(
            F.log(F.sum("dl").over(w).cast("double")).alias("x"),
            F.log(F.sum("new_terms").over(w).cast("double")).alias("y"),
        )
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return pts.agg(
        F.count("*").alias("n_points"),
        F.round(F.exp(F.max("x")), 0).cast("long").alias("t_total"),
        F.round(F.exp(F.max("y")), 0).cast("long").alias("v_total"),
        F.round(slope, round_digits).alias("beta"),
        F.round(F.avg("y") - slope * F.avg("x"), round_digits).alias("ln_k"),
        F.round(
            F.covar_pop("x", "y") * F.covar_pop("x", "y")
            / (F.var_pop("x") * F.var_pop("y")),
            round_digits,
        ).alias("r2"),
    )


def lang_confusion(
    docs: DataFrame,
    text_col: str = "text",
    truth_col: str = "lang",
) -> DataFrame:
    """Language-ID confusion matrix: the stopword-ratio detector's
    prediction (detect_language) against the corpus's labeled language
    — the pipeline-QA view of the detector (per-class confusion is what
    decides routing thresholds at crawl scale, not overall accuracy).
    Returns (lang_true, lang_pred, n_docs, share_of_true) where share
    is within the true-language row. Pure Catalyst end to end."""
    pred = docs.select(
        F.col(truth_col).alias("lang_true"),
        detect_language(F.col(text_col)).alias("lang_pred"),
    )
    counts = pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("lang_true")
    return counts.select(
        "lang_true",
        "lang_pred",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias(
            "share_of_true"
        ),
    ).orderBy("lang_true", "lang_pred")


def char_entropy(
    docs: DataFrame,
    text_col: str = "text",
    low_bits: float = 3.0,
    round_digits: int = 4,
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution — the
    cheapest spam/degenerate-text detector there is: keyboard mashing,
    single-char padding, base64 walls and repeated-separator dumps all
    sit far from natural text's ~4-4.5 bits/char. Gopher-style pipelines
    gate on exactly this signal next to the repetition ratios
    (ops/textstats.py:repetition_signals is the n-gram cousin).

    Entropy is computed from per-(doc, char) counts with the
    sum-of-c*log2(c) identity

        H = log2(n) - (sum_c c*log2(c)) / n

    so it needs ONE explode + TWO hash aggregates and no per-row
    probability join — map-side combinable, linear in corpus bytes,
    no UDF. Returns (doc_id, n_chars, n_unique_chars, entropy_bits,
    is_low_entropy) with entropy rounded for cross-engine stability."""
    chars = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col(text_col), ""), lambda x: x != "")
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.count(F.lit(1)).alias("n_unique_chars"),
        F.sum(F.col("c") * F.log2("c")).alias("s"),
    )
    ent = F.round(
        F.log2("n_chars") - F.col("s") / F.col("n_chars"), round_digits
    )
    return per_doc.select(
        "doc_id",
        "n_chars",
        "n_unique_chars",
        ent.alias("entropy_bits"),
        (ent < F.lit(low_bits)).alias("is_low_entropy"),
    )


def segment_queries(
    docs: DataFrame,
    queries: DataFrame,
    pmi_threshold: float = 1.0,
    min_pair_count: int = 2,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Query segmentation by corpus PMI (the unsupervised baseline of
    Bergsma & Wang 2007 / Hagen et al. 2010): adjacent query terms stay
    in one segment iff their corpus-bigram PMI clears the threshold —
    "new york" survives as a phrase unit, "york restaurant" splits.
    Segments are what the engine turns into phrase clauses or
    proximity-boosted groups instead of a flat bag of words.

    Break rule between positions i and i+1: break unless the bigram
    (w_i, w_{i+1}) has corpus count >= min_pair_count AND
    PMI = ln(P(ab) / (P(a) P(b))) >= pmi_threshold (same estimator as
    pmi_collocations). Segment ids are the running sum of breaks — a
    per-query window over query-length rows, trivially cheap; the only
    corpus-scale work is the bigram/unigram count pass, shared, bounded
    by vocabulary. Returns (query_id, seg_idx, segment, n_terms)."""
    toks = docs.select(_tokens(F.col(text_col)).alias("toks"))
    big = toks.select(F.explode(F.expr(_BIGRAM_EXPR)).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    uni = toks.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c_w")
    )
    pair = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    totals = pair.agg(F.sum("n_pair").alias("n_bigrams")).crossJoin(
        uni.agg(F.sum("c_w").alias("n_tokens"))
    )
    pmi_tbl = (
        pair.filter(F.col("n_pair") >= min_pair_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_bigrams"))
                    / (
                        (F.col("c1") / F.col("n_tokens"))
                        * (F.col("c2") / F.col("n_tokens"))
                    )
                ),
                round_digits,
            ).alias("pmi"),
        )
    )
    qtok = queries.select(
        "query_id",
        F.posexplode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("pos", "term"),
    )
    wq = Window.partitionBy("query_id").orderBy("pos")
    pairs = qtok.withColumn("prev", F.lag("term").over(wq))
    joined = pairs.join(
        pmi_tbl,
        (F.col("prev") == F.col("w1")) & (F.col("term") == F.col("w2")),
        "left",
    )
    brk = F.when(
        F.col("prev").isNull()
        | F.col("pmi").isNull()
        | (F.col("pmi") < pmi_threshold),
        1,
    ).otherwise(0)
    seg = (
        joined.withColumn("brk", brk)
        .withColumn(
            "seg_idx",
            (F.sum("brk").over(
                wq.rowsBetween(Window.unboundedPreceding, 0)
            ) - 1).cast("long"),
        )
    )
    return (
        seg.groupBy("query_id", "seg_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "term"))
                    ),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("segment"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy("query_id", "seg_idx")
    )


def code_switch_windows(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Mixed-language (code-switching) detection: slice each document
    into fixed non-overlapping ``window``-token windows, run the
    stopword-ratio language detector per window, and roll up the
    per-window verdicts. A web page whose windows disagree is boilerplate
    soup, a template wrapping foreign content, or genuine code-switching
    — all cases a doc-level language label silently mislabels, which is
    why CCNet/fastText pipelines paragraph-split before LID.

    Returns per doc: (doc_id, n_windows, n_langs, switches,
    dominant_lang, minority_frac, code_switched) where switches counts
    adjacent window pairs whose language differs, dominant is the modal
    window language (count desc, lang asc ties), minority_frac the
    fraction of windows not in the dominant language, and
    code_switched = (n_langs >= 2) over non-'und' window verdicts.

    Scale shape: windows are a per-row sequence + slice flat-map (pure
    Catalyst), the detector is the existing arms expression, the rollup
    is two doc-keyed aggregates — corpus-linear, no UDF."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    n_win = F.ceil(n / F.lit(float(window))).cast("int")
    w = docs.select(
        "doc_id", toks.alias("toks"), F.greatest(n_win, F.lit(1)).alias("n_win")
    )
    wins = w.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_win") - 1)).alias("widx"),
        "toks",
    ).select(
        "doc_id",
        "widx",
        F.array_join(
            F.slice(F.col("toks"), F.col("widx") * window + 1, F.lit(window)),
            " ",
        ).alias("wtext"),
    )
    wl = wins.select(
        "doc_id", "widx", detect_language(F.col("wtext")).alias("lang_w")
    )
    order = Window.partitionBy("doc_id").orderBy("widx")
    flagged = wl.withColumn(
        "switch",
        F.when(
            F.lag("lang_w").over(order).isNotNull()
            & (F.col("lang_w") != F.lag("lang_w").over(order)),
            1,
        ).otherwise(0),
    )
    per_lang = wl.groupBy("doc_id", "lang_w").agg(
        F.count(F.lit(1)).alias("c")
    )
    dom = Window.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("lang_w").asc()
    )
    dominant = (
        per_lang.withColumn("rn", F.row_number().over(dom))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang_w").alias("dominant_lang"),
                F.col("c").alias("dom_c"))
    )
    rollup = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.count_distinct(
            F.when(F.col("lang_w") != "und", F.col("lang_w"))
        ).alias("n_langs"),
        F.sum("switch").alias("switches"),
    )
    return (
        rollup.join(dominant, "doc_id")
        .select(
            "doc_id",
            "n_windows",
            "n_langs",
            "switches",
            "dominant_lang",
            F.round(
                (F.col("n_windows") - F.col("dom_c")) / F.col("n_windows"),
                round_digits,
            ).alias("minority_frac"),
            (F.col("n_langs") >= 2).alias("code_switched"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 200,
    lang_col: str = "lang",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: pin the vocabulary to the
    corpus's top-``vocab_size`` terms by collection frequency
    (deterministic ties: term asc) and report, per language, the
    out-of-vocabulary token rate and type rate — the standard
    coverage check before committing a vocab to a multilingual run
    (high OOV on a language means its text fragments into fallback
    bytes/unks; cf. the fertility audit in ops/bpe.py, which measures
    the same risk post-tokenizer).

    Scale shape: one (lang, term) tf aggregate, a row_number top-V on
    the term-totals relation, and a broadcast join of the V-row vocab
    back onto the per-language term stats. No UDFs, no driver state.

    Returns (lang, tokens, oov_tokens, oov_token_rate, types,
    oov_types, oov_type_rate) ordered by lang.
    """
    toks = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    per = toks.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    totals = per.groupBy("term").agg(F.sum("tf").alias("cf"))
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    vocab = (
        totals.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= vocab_size)
        .select("term")
    )
    flagged = per.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "term", "left"
    ).withColumn("oov", F.col("in_vocab").isNull().cast("int"))
    return (
        flagged.groupBy("lang")
        .agg(
            F.sum("tf").alias("tokens"),
            F.sum(F.col("tf") * F.col("oov")).alias("oov_tokens"),
            F.count("*").alias("types"),
            F.sum("oov").alias("oov_types"),
        )
        .select(
            "lang",
            "tokens",
            "oov_tokens",
            F.round(
                F.col("oov_tokens") / F.col("tokens"), round_digits
            ).alias("oov_token_rate"),
            "types",
            "oov_types",
            F.round(
                F.col("oov_types") / F.col("types"), round_digits
            ).alias("oov_type_rate"),
        )
        .orderBy("lang")
    )


def lexical_richness(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Lexical-richness battery from the frequency spectrum, per group.

    The classic vocabulary-richness constants computed from V_m (the
    number of types occurring exactly m times) — Herdan, "Type-token
    mathematics" (1960); Yule, "The statistical study of literary
    vocabulary" (1944); Simpson (Nature 1949):

        TTR       = V / N
        Herdan C  = ln V / ln N            (length-corrected TTR)
        Yule K    = 10^4 * (sum_m m^2 V_m - N) / N^2
        Simpson D = sum_m V_m * m(m-1) / (N(N-1))
        hapax     = V_1 / V

    K and D are repeat-rate measures — nearly length-invariant, which
    is why they survive as corpus-quality signals where raw TTR
    collapses (a template-stuffed source shows low K-diversity long
    before dedup fires; the spectrum is also the input Heaps'-law
    fitting uses in ``heaps_fit``).

    Scale shape: tokenize -> (group, term) counts -> (group, m)
    spectrum -> one row per group; every stage a hash aggregate.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("m"))
    spec = tf.groupBy("grp", "m").agg(F.count(F.lit(1)).alias("vm"))
    agg = spec.groupBy("grp").agg(
        F.sum(F.col("vm") * F.col("m")).alias("n_tokens"),
        F.sum("vm").alias("n_types"),
        F.sum(F.when(F.col("m") == 1, F.col("vm")).otherwise(0)).alias(
            "v1"
        ),
        F.sum(F.col("vm") * F.col("m") * F.col("m")).alias("m2sum"),
        F.sum(
            F.col("vm") * F.col("m") * (F.col("m") - 1)
        ).alias("rep_pairs"),
    )
    n = F.col("n_tokens").cast("double")
    v = F.col("n_types").cast("double")
    return agg.select(
        "grp",
        "n_tokens",
        "n_types",
        F.round(v / n, round_digits).alias("ttr"),
        F.round(F.log(v) / F.log(n), round_digits).alias("herdan_c"),
        F.round(
            F.lit(10000.0) * (F.col("m2sum") - n) / (n * n),
            round_digits,
        ).alias("yule_k"),
        F.round(
            F.col("rep_pairs") / (n * (n - 1)), round_digits
        ).alias("simpson_d"),
        F.round(F.col("v1") / v, round_digits).alias("hapax_rate"),
    )


def entity_salience(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Model-free entity-salience proxy — capitalized-mention
    frequency weighted by first-mention position.

    The two features every learned salience model leans on hardest
    (Dunietz & Gillick, EACL 2014: "first sentence position and
    frequency dominate"): an entity mentioned EARLY and OFTEN is what
    the document is about.  Entities here are the parser-free proxy:
    capitalized tokens (not sentence-initial — position > 1 after a
    non-boundary) aggregated per document, scored

        salience = tf * (1 / (1 + first_pos / 50))

    and rolled up per source as the top-``k`` salient entities by
    summed salience — the corpus-level aboutness profile.

    (rank, grp, entity, n_docs, total_tf, score); one posexplode +
    regexp filter, two hash aggregations.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda x: x != ""
            )
        ).alias("pos", "tok"),
    )
    ents = toks.filter(
        (F.col("pos") > 0) & F.col("tok").rlike("^[A-Z][a-z]+$")
    ).select("doc_id", "grp", F.lower("tok").alias("entity"), "pos")
    per_doc = ents.groupBy("doc_id", "grp", "entity").agg(
        F.count(F.lit(1)).alias("tf"),
        F.min("pos").alias("first_pos"),
    )
    scored = per_doc.withColumn(
        "sal",
        F.col("tf") / (1.0 + F.col("first_pos") / F.lit(50.0)),
    )
    agg = scored.groupBy("grp", "entity").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tf").alias("total_tf"),
        F.sum("sal").alias("score_raw"),
    )
    w = Window.partitionBy("grp").orderBy(
        F.round("score_raw", 9).desc(), F.col("entity").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank", "grp", "entity", "n_docs", "total_tf",
            F.round("score_raw", round_digits).alias("score"),
        )
    )


def luhn_sentences(
    docs: DataFrame,
    sig_min_tf: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Luhn significant-sentence scoring — the original automatic
    abstract.

    Luhn, "The automatic creation of literature abstracts" (IBM J.
    R&D 1958): SIGNIFICANT words are the document's frequent
    non-stopwords (tf >= ``sig_min_tf`` here, stopword-filtered); a
    sentence's score is the density of its significant-word cluster,

        score = (#significant tokens)^2 / span

    with span = last - first significant position + 1 inside the
    sentence (the simplified single-cluster variant of Luhn's
    bracketing).  The top-scoring sentence per document IS the
    one-line extractive summary — the 1958 ancestor of the LexRank/
    TextRank extractors next door (``ops/lexrank.py``,
    ``textrank``).

    Per doc: (doc_id, sent_idx, n_sig, span, score, sentence).
    Shape: sentence split + posexplode inside sentence, doc-level
    significant-word table joined back on (doc, term).
    """
    from pyspark.sql import Window

    from tokenkit_spark.analyzers.filters import ENGLISH_STOPWORDS

    # plain period split (the delimiter is consumed) — RE2-safe so the
    # oracle splits identically; the richer boundary logic lives in
    # analyzers/segmentation.py
    sents = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\.\s+"),
                lambda s: F.trim(s) != "",
            )
        ).alias("sent_idx", "sentence"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z']+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    stop = [s for s in ENGLISH_STOPWORDS]
    sig = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(
            (F.col("tf") >= sig_min_tf) & ~F.col("term").isin(stop)
        )
        .select("doc_id", "term")
    )
    stoks = sents.select(
        "doc_id",
        "sent_idx",
        "sentence",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("sentence")), r"[^a-z']+"),
                lambda x: x != "",
            )
        ).alias("pos", "term"),
    )
    hits = stoks.join(sig, ["doc_id", "term"])
    scored = (
        hits.groupBy("doc_id", "sent_idx", "sentence")
        .agg(
            F.count(F.lit(1)).alias("n_sig"),
            (
                F.max("pos") - F.min("pos") + 1
            ).alias("span"),
        )
        .withColumn(
            "score",
            F.col("n_sig") * F.col("n_sig")
            / F.col("span").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round("score", 9).desc(), F.col("sent_idx").asc()
    )
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "doc_id",
            "sent_idx",
            "n_sig",
            "span",
            F.round("score", round_digits).alias("score"),
            "sentence",
        )
    )


def char_entropy_orders(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Zero- and first-order character entropy per source — the
    Shannon redundancy profile.

    Shannon, "Prediction and entropy of printed English" (BSTJ 1951):
    H0 = unigram character entropy, H1 = conditional entropy
    H(X_t | X_{t-1}) from the character-bigram distribution,

        H1 = H(bigram) - H(unigram)

    (chain rule); redundancy = 1 - H1/H0.  H1 well below H0 is the
    structure every compressor exploits — per SOURCE these numbers
    bound achievable storage (the measured cousin of the codec audits'
    per-posting bytes) and flag machine-generated text (near-zero
    redundancy = random-ish strings; extreme redundancy = templates).

    Per source: (grp, n_chars, h0_bits, h1_bits, redundancy).
    One character explode + two count rollups; entropies from count
    tables, never per-row logs.
    """
    chars = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "")
        ).alias("c"),
    ).filter(F.col("c") != "")
    uni = chars.groupBy("grp", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = uni.groupBy("grp").agg(F.sum("n").alias("t"))
    h0 = (
        uni.join(tot, "grp")
        .groupBy("grp")
        .agg(
            (
                -F.sum(
                    (F.col("n") / F.col("t"))
                    * F.log2(F.col("n") / F.col("t"))
                )
            ).alias("h0")
        )
    )
    # bigrams via self-zip on position within (grp, doc) — use the
    # text directly: consecutive char pairs per document
    big = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(
                            F.length(F.lower(F.col(text_col))) - 1,
                            F.lit(1),
                        ),
                    ),
                    lambda i: F.when(
                        i < F.length(F.lower(F.col(text_col))),
                        F.lower(F.col(text_col)).substr(i, F.lit(2)),
                    ),
                ),
                lambda g: g.isNotNull(),
            )
        ).alias("bg"),
    )
    bi = big.groupBy("grp", "bg").agg(F.count(F.lit(1)).alias("n"))
    btot = bi.groupBy("grp").agg(F.sum("n").alias("t"))
    hb = (
        bi.join(btot, "grp")
        .groupBy("grp")
        .agg(
            (
                -F.sum(
                    (F.col("n") / F.col("t"))
                    * F.log2(F.col("n") / F.col("t"))
                )
            ).alias("hb")
        )
    )
    return (
        tot.join(h0, "grp")
        .join(hb, "grp")
        .select(
            "grp",
            F.col("t").alias("n_chars"),
            F.round("h0", round_digits).alias("h0_bits"),
            F.round(F.col("hb") - F.col("h0"), round_digits).alias(
                "h1_bits"
            ),
            F.round(
                1.0 - (F.col("hb") - F.col("h0")) / F.col("h0"),
                round_digits,
            ).alias("redundancy"),
        )
    )


def novelty_curve(
    docs: DataFrame,
    n_bins: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Trigram novelty decay across ingestion order — how fast new
    content dries up as the corpus grows.

    The dedup-planning curve (what the RefinedWeb/FineWeb reports
    plot as "fraction of novel content by dump"): ingest documents in
    ``id_col`` order, bucket them into ``n_bins`` equal deciles, and
    measure per bucket the fraction of its word-trigram OCCURRENCES
    whose trigram was never seen in any earlier document.  First-
    occurrence attribution via a per-trigram MIN(doc) — one pass, no
    ordered state.  A curve that collapses early says incremental
    crawling is re-fetching the same content (and bounds what
    ``minhash``/containment dedup can save).

    Per bucket: (bucket, n_docs, n_gram_occurrences, n_novel,
    novelty_rate).
    """
    from pyspark.sql import Window

    w = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(F.size(w) - 1, F.lit(0)),
                    ),
                    lambda i: F.when(
                        i + 2 < F.size(w),
                        F.concat_ws(
                            " ",
                            F.get(w, i),
                            F.get(w, i + 1),
                            F.get(w, i + 2),
                        ),
                    ),
                ),
                lambda g: g.isNotNull(),
            )
        ).alias("gram"),
    )
    firsts = grams.groupBy("gram").agg(
        F.min("doc_id").alias("first_doc")
    )
    ranked_docs = docs.select(F.col(id_col).alias("doc_id")).withColumn(
        "rn",
        F.row_number().over(Window.orderBy("doc_id")) - 1,
    )
    n_docs = docs.count()
    per_doc_bucket = ranked_docs.select(
        "doc_id",
        F.least(
            F.lit(n_bins - 1).cast("long"),
            F.floor(F.col("rn") * n_bins / F.lit(n_docs)).cast(
                "long"
            ),
        ).alias("bucket"),
    )
    tagged = (
        grams.join(firsts, "gram")
        .join(per_doc_bucket, "doc_id")
        .select(
            "bucket",
            (F.col("first_doc") == F.col("doc_id")).cast("long").alias(
                "novel"
            ),
        )
    )
    occ = tagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_gram_occurrences"),
        F.sum("novel").alias("n_novel"),
    )
    sizes = per_doc_bucket.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return sizes.join(occ, "bucket").select(
        "bucket",
        "n_docs",
        "n_gram_occurrences",
        "n_novel",
        F.round(
            F.col("n_novel") / F.col("n_gram_occurrences"),
            round_digits,
        ).alias("novelty_rate"),
    )


def term_burstiness(
    docs: DataFrame,
    k: int = 20,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Church-Gale term burstiness — which terms clump instead of
    sprinkling?

    Church & Gale, "Poisson mixtures" (Natural Language Engineering
    1995): content words violate the Poisson assumption — given one
    occurrence, more are likely in the SAME document.  Diagnostics
    per term: the burstiness ratio cf/df (mean tf in docs containing
    the term; Katz 1996's B), the Poisson-expected df at the same cf
    (N * (1 - exp(-cf/N))), and the adaptation probability
    P(tf >= 2 | tf >= 1) — the Church (2000) "adaptation" statistic.
    High-burstiness terms are topical (index/score them well); ratio
    ~ 1 marks function words — a stopword-induction signal orthogonal
    to ``ops/stopwords.py``'s term strength.

    Top-``k`` terms by (burstiness desc) among df >= min_df:
    (rank, term, df, cf, burstiness, poisson_df, df_ratio,
    p_adapt).  One (term, doc) rollup + one term rollup.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    n_docs = docs.select(id_col).distinct().count()
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    agg = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.sum((F.col("tf") >= 2).cast("long")).alias("df2"),
    ).filter(F.col("df") >= min_df)
    burst = F.col("cf") / F.col("df").cast("double")
    poisson_df = F.lit(float(n_docs)) * (
        1.0 - F.exp(-F.col("cf") / F.lit(float(n_docs)))
    )
    w = Window.orderBy(
        F.round(burst, 9).desc(), F.col("term").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "df",
            "cf",
            F.round(burst, round_digits).alias("burstiness"),
            F.round(poisson_df, round_digits).alias("poisson_df"),
            F.round(
                F.col("df") / poisson_df, round_digits
            ).alias("df_ratio"),
            F.round(
                F.col("df2") / F.col("df").cast("double"),
                round_digits,
            ).alias("p_adapt"),
        )
    )


def perplexity_filter_sweep(
    docs: DataFrame,
    thresholds=(50.0, 100.0, 200.0, 400.0, 800.0),
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Perplexity-filter threshold sweep — the kept-mass curve that
    turns a quality knob into a decision.

    The CCNet/Wenzek et al. (2020) pipeline buckets web text by LM
    perplexity and KEEPS a quantile; picking the cutoff is always done
    off exactly this curve: for each candidate threshold, how much of
    the corpus survives and what does the surviving distribution look
    like.  Reuses the self-contained bigram LM scorer
    (``bigram_lm_perplexity``) so the sweep is engine-reproducible.

    Per threshold: (threshold, n_kept, frac_kept, mean_ppl_kept) over
    the docs with >= 2 tokens (the scorable set).
    """
    ppl = bigram_lm_perplexity(docs, text_col=text_col)
    n_total = ppl.count()
    out = None
    for t in thresholds:
        row = ppl.filter(F.col("ppl") <= t).agg(
            F.lit(float(t)).alias("threshold"),
            F.count(F.lit(1)).alias("n_kept"),
            F.round(
                F.count(F.lit(1)) / F.lit(float(n_total)),
                round_digits,
            ).alias("frac_kept"),
            F.round(F.avg("ppl"), round_digits).alias(
                "mean_ppl_kept"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


ZM_Q_GRID = (0.0, 1.0, 2.7, 5.0, 10.0)


def zipf_mandelbrot_fit(
    docs: DataFrame,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Zipf-Mandelbrot fit over a pinned shift grid — the two-
    parameter rank-frequency law.

    Mandelbrot ("An informational theory of the statistical structure
    of language", 1953) generalizes Zipf's f ~ r^-s to
    f ~ (r + q)^-s: the shift q fixes the head flattening every real
    vocabulary shows (pure Zipf systematically over-predicts the top
    ranks).  Fitting is OLS of ln f on ln(r + q) for each q in a
    PINNED grid, keeping the best R^2 — grid-plus-OLS instead of a
    nonlinear optimizer so the whole fit is closed-form relational
    arithmetic on both engines.

    One row per q: (q, s_exponent, ln_c, r2, best) with ``best``
    marking the argmax R^2 — the curve-vs-grid view, not just the
    winner.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("term").asc())
    ranked = freq.withColumn("r", F.row_number().over(w))
    out = None
    for q in ZM_Q_GRID:
        pts = ranked.select(
            F.log(F.col("r") + F.lit(float(q))).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
        slope = F.covar_pop("x", "y") / F.var_pop("x")
        row = pts.agg(
            F.lit(float(q)).alias("q"),
            F.round(-slope, round_digits).alias("s_exponent"),
            F.round(
                F.avg("y") - slope * F.avg("x"), round_digits
            ).alias("ln_c"),
            F.round(
                F.covar_pop("x", "y")
                * F.covar_pop("x", "y")
                / (F.var_pop("x") * F.var_pop("y")),
                round_digits,
            ).alias("r2"),
        )
        out = row if out is None else out.unionByName(row)
    wb = Window.orderBy(F.lit(1))
    return out.withColumn(
        "best", F.col("r2") == F.max("r2").over(wb)
    )


LEAD_BUCKETS = 5


def lead_bias_audit(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Lead-position bias of query-term matches — where in documents
    do the matches live?

    The empirical fact behind lead-paragraph summarization baselines
    (the "lead-3 is hard to beat" observation of the CNN/DM
    literature) and first-passage retrieval (``index/maxp.py``'s
    cousin): if query-term mass concentrates in document heads,
    passage retrieval can index prefixes and snippets can skip deep
    scans.  For every (query term, document) match, bucket the match
    position by relative offset (position/doc_length into
    ``LEAD_BUCKETS`` fifths) and report the distribution plus its
    lead ratio vs the uniform expectation.

    Per bucket: (bucket, n_matches, share, uniform_share, lift).
    Shape: one posexplode + broadcast term join + two rollups.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("pos", "term"),
    )
    dl = toks.groupBy("doc_id").agg(F.max("pos").alias("maxp"))
    qterms = queries.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term")
    ).distinct()
    hits = (
        toks.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .select(
            F.least(
                F.lit(LEAD_BUCKETS - 1),
                F.floor(
                    F.col("pos")
                    * LEAD_BUCKETS
                    / (F.col("maxp") + 1)
                ).cast("long"),
            ).alias("bucket")
        )
    )
    tot = hits.count()
    return (
        hits.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .select(
            "bucket",
            "n_matches",
            F.round(
                F.col("n_matches") / F.lit(float(tot)), round_digits
            ).alias("share"),
            F.round(
                F.lit(1.0 / LEAD_BUCKETS), round_digits
            ).alias("uniform_share"),
            F.round(
                F.col("n_matches")
                / F.lit(float(tot))
                * LEAD_BUCKETS,
                round_digits,
            ).alias("lift"),
        )
    )


def lognormal_length_fit(
    docs: DataFrame,
    length_col: str = "n_chars",
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Log-normal fit of the document-length distribution per source.

    Document lengths on the web are canonically log-normal (Mitzenmacher,
    "A brief history of generative models for power law and lognormal
    distributions", Internet Math. 2004 — the companion result to the
    Zipf fits elsewhere in this module): fit by moments of ln(length),
    mu = mean, sigma = std of the logs, and report the implied MEDIAN
    e^mu against the empirical median — a large gap is the cheap
    misfit flag (mixtures/templates), without needing a QQ plot.

    Per source: (grp, n, mu_log, sigma_log, implied_median,
    empirical_median, median_ratio).  Sufficient-statistic sums +
    one exact median per group.
    """
    v = docs.select(
        F.col(group_col).alias("grp"),
        F.log(F.col(length_col).cast("double")).alias("lx"),
        F.col(length_col).cast("double").alias("x"),
    ).filter(F.col("x") > 0)
    agg = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lx").alias("s"),
        F.sum(F.col("lx") * F.col("lx")).alias("ss"),
        F.median("x").alias("emp_med"),
    )
    mu = F.col("s") / F.col("n")
    sigma = F.sqrt(
        F.greatest(
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
            / F.col("n"),
            F.lit(0.0),
        )
    )
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.round(mu, round_digits).alias("mu_log"),
        F.round(sigma, round_digits).alias("sigma_log"),
        F.round(F.exp(mu), round_digits).alias("implied_median"),
        F.round("emp_med", round_digits).alias("empirical_median"),
        F.round(
            F.exp(mu) / F.col("emp_med"), round_digits
        ).alias("median_ratio"),
    )


def token_fertility(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language token fertility — the tokenizer-bias number.

    Fertility (characters consumed per token) is the standard
    measure of how well a tokenizer serves a language: a BPE trained
    on English yields short tokens (high token counts, low
    chars/token) for scripts it under-represents, inflating their
    compute cost per byte of content.  Whitespace tokens give the
    word-level baseline; the subword proxy counts alternating
    letter/digit runs (the pre-tokenization pattern BPE splits
    start from).

    Per lang: (lang, n_docs, total_chars, ws_tokens, subword_units)
    — integer sums only (fertility ratios are total_chars /
    ws_tokens, total_chars / subword_units, and subword_units /
    ws_tokens), so the audit hashes identically on every engine.
    """
    t = F.col(text_col)
    nchars = F.length(t)
    ws = F.size(
        F.filter(
            F.split(t, r"\s+"), lambda x: x != ""
        )
    )
    sub = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    per = docs.select(
        F.col(lang_col).alias("lang"),
        nchars.alias("c"),
        ws.alias("w"),
        sub.alias("s"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("c").alias("total_chars"),
        F.sum("w").alias("ws_tokens"),
        F.sum("s").alias("subword_units"),
    )
