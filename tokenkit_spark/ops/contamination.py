"""Benchmark-contamination detection: token n-gram overlap between a
training corpus and an evaluation set (the GPT-3 / PaLM / Llama decontam
methodology — flag a training doc when it shares >= 1 verbatim n-gram
with an eval item; Brown et al. 2020 §C uses 13-grams, smaller n for
short eval items).

Scale shape (the part that matters at 100 TB):
- per-doc n-gram sets are built with PURE Catalyst array lambdas
  (``transform`` over ``sequence`` + ``slice`` + ``array_join``) and
  deduped with ``array_distinct`` BEFORE the explode — no
  distinct-shuffle anywhere on the training side;
- the eval side is small by construction (benchmarks are thousands of
  items, not billions) and broadcasts, so the gram equi-join is a
  map-side broadcast hash join over the streaming training grams;
- the only shuffle is the final (doc_id, eval_id) count, which partial
  aggregation flattens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_sets(df: DataFrame, n: int, text_col: str, id_alias: str) -> DataFrame:
    """(id_alias, gram) — each row one DISTINCT token n-gram of one doc;
    dedup happens inside the row (array_distinct) so no shuffle."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), x -> x <> '')"
    )
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(_toks) - {n - 1}, 0)), "
        f"i -> array_join(slice(_toks, i, {n}), ' ')))"
    )
    return (
        df.select(F.col("doc_id").alias(id_alias), toks.alias("_toks"))
        .select(id_alias, F.explode(grams).alias("gram"))
    )


def shared_span_pairs(
    docs: DataFrame,
    n: int = 20,
    max_gram_df: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id_a, doc_id_b, n_shared_grams): document pairs sharing at
    least one verbatim ``n``-token span — the corpus SELF-join twin of
    ``ngram_contamination`` and the gram-granularity formulation of
    exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better": their suffix-array finds spans >= 50
    tokens; a span of length L >= n is detected here iff any of its
    L - n + 1 grams matches, which is always, so recall is exact at span
    granularity n).

    ``max_gram_df`` is MANDATORY at scale: a boilerplate gram shared by
    10^5 docs makes the self-join quadratic in that group (the
    ngram_jaccard lesson, VERDICT r01). Grams above the cap are dropped
    before the join — pairs whose only shared spans are corpus-wide
    boilerplate are intentionally not reported."""
    grams = _gram_sets(docs, n, text_col, "doc_id")
    if max_gram_df is not None:
        dfc = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
        grams = grams.join(
            dfc.filter(F.col("_df") <= max_gram_df).select("gram"), "gram"
        )
    a = grams.select(F.col("doc_id").alias("doc_id_a"), "gram")
    b = grams.select(F.col("doc_id").alias("doc_id_b"), "gram")
    return (
        a.join(b, "gram")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def ngram_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, eval_id, n_shared_grams) for every training doc sharing
    at least one verbatim token ``n``-gram with an eval item — sorted by
    nothing (caller ranks); counts are over DISTINCT grams on both
    sides, so a gram repeated inside a doc counts once."""
    train_g = _gram_sets(train_docs, n, text_col, "doc_id")
    eval_g = _gram_sets(eval_docs, n, text_col, "eval_id")
    return (
        train_g.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def remove_duplicated_spans(
    docs: DataFrame, n: int = 10, text_col: str = "text"
) -> DataFrame:
    """Exact-substring DEDUP WITH REMOVAL (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    formulation, token-window approximation): any n-token span that
    appears verbatim in MORE THAN ONE document is cut from every
    document containing it; the cleaned text is re-assembled from the
    surviving tokens. Returns (doc_id, n_tokens, n_removed, clean_text).

    Policy note: all occurrences of a cross-doc duplicated span are
    removed (symmetric, order-free — no "keep first" tie to document
    ordering), which is the deterministic variant a distributed engine
    can apply without a global doc order.

    Scale shape: positional grams are Catalyst array lambdas; the gram
    df table is one map-side-combinable aggregate; covered positions
    explode only MATCHED grams (n rows per duplicated gram occurrence);
    the final anti-join + per-doc re-assembly shuffles token rows once.
    """
    toks = F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x <> '')")
    base = docs.select("doc_id", toks.alias("_toks"))
    grams_pos = base.select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        F.explode(
            F.expr(
                f"CASE WHEN size(_toks) < {n} THEN "
                "CAST(array() AS array<struct<pos:int,gram:string>>) ELSE "
                f"transform(sequence(1, size(_toks) - {n - 1}), "
                f"i -> struct(i - 1 AS pos, array_join(slice(_toks, i, {n}), ' ') AS gram)) END"
            )
        ).alias("g"),
    ).select("doc_id", "n_tokens", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))

    dup_grams = (
        grams_pos.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram")
    )
    covered = (
        grams_pos.join(dup_grams, "gram")
        .select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("cpos")
        )
        .distinct()
    )
    tok_rows = base.select(
        "doc_id", F.size("_toks").alias("n_tokens"), F.posexplode("_toks").alias("pos", "tok")
    )
    kept = tok_rows.join(
        covered,
        (tok_rows.doc_id == covered.doc_id) & (tok_rows.pos == covered.cpos),
        "left_anti",
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("doc_id", F.size("_toks").alias("n_tokens"))
        .join(reassembled.drop("n_tokens"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens").cast("long") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


SPECIAL_TOKENS = [
    "<|endoftext|>", "<s>", "</s>", "[CLS]", "[SEP]", "<extra_id_0>",
    "<|im_start|>", "<|im_end|>",
]


def special_token_scan(
    docs: DataFrame,
    tokens: list[str] | None = None,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Control-token contamination scan: web text that *contains a
    tokenizer's special tokens as literal strings* poisons training —
    the model learns to emit structure markers from data instead of
    from the template (every tokenizer release documents this;
    e.g. the GPT-2 <|endoftext|> and SentencePiece <s>/</s> reserved
    pieces; pipelines escape or strip them before tokenization).

    One row per (group, token) with occurrences: (group, token,
    n_docs, n_occurrences) — rows only where the token appears.
    Scale shape: each token is one codegen ``instr``/``regexp_count``
    over the scan (the token list is a constant unrolled into the
    projection, no join), then a (group)-keyed hash aggregate.
    """
    toks = tokens if tokens is not None else SPECIAL_TOKENS
    import re as _re

    per = docs.select(
        group_col,
        *[
            F.regexp_count(text_col, F.lit(_re.escape(t))).alias(f"_c{i}")
            for i, t in enumerate(toks)
        ],
    )
    agg = per.groupBy(group_col).agg(
        *[
            x
            for i, _ in enumerate(toks)
            for x in (
                F.sum((F.col(f"_c{i}") > 0).cast("int")).alias(f"_d{i}"),
                F.sum(f"_c{i}").alias(f"_o{i}"),
            )
        ]
    )
    parts = [
        agg.select(
            F.col(group_col),
            F.lit(t).alias("token"),
            F.col(f"_d{i}").cast("long").alias("n_docs"),
            F.col(f"_o{i}").cast("long").alias("n_occurrences"),
        )
        for i, t in enumerate(toks)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("n_docs") > 0)


INJECTION_PATTERNS = (
    "ignore previous instructions",
    "ignore all prior instructions",
    "disregard the above",
    "you are now dan",
    "system prompt:",
    "begin admin override",
)


def injection_scan(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Prompt-injection phrase scan — the LLM-corpus safety sibling of
    the special-token scan.

    Training text containing instruction-hijack phrasing teaches the
    model that such strings are ordinary prose worth continuing — the
    data-side half of indirect prompt injection (Greshake et al.,
    AISec 2023 framed the attack; corpus phrase-scanning is the
    standard mitigation next to special-token stripping).  The scan
    is a pinned case-insensitive phrase list; per source: affected
    docs, total hits, and the modal phrase (first-listed on ties).

    Per (grp): (grp, n_docs, docs_hit, total_hits, top_phrase) —
    integer counts only (the hit share is docs_hit / n_docs), so the
    scan hashes identically on every engine.
    """
    t = F.lower(F.col(text_col))
    n = len(INJECTION_PATTERNS)
    per = docs.select(
        F.col(group_col).alias("grp"),
        *[
            F.regexp_count(t, F.lit(p)).alias(f"h{i}")
            for i, p in enumerate(INJECTION_PATTERNS)
        ],
    )
    total = F.col("h0")
    for i in range(1, n):
        total = total + F.col(f"h{i}")
    per = per.withColumn("tot", total)
    g = per.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("tot") > 0).cast("long")).alias("docs_hit"),
        F.sum("tot").alias("total_hits"),
        *[F.sum(f"h{i}").alias(f"s{i}") for i in range(n)],
    )

    # modal phrase = first index attaining the max, provided it is >0
    def _is_top(i: int):
        c = F.col(f"s{i}") > 0
        for j in range(n):
            if j != i:
                c = c & (F.col(f"s{i}") >= F.col(f"s{j}"))
        return c

    top = F.lit("none")
    for i in reversed(range(n)):
        top = F.when(
            _is_top(i), F.lit(INJECTION_PATTERNS[i])
        ).otherwise(top)
    return g.select(
        "grp",
        "n_docs",
        "docs_hit",
        "total_hits",
        top.alias("top_phrase"),
    )


def markdown_scan(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Markdown-structure contamination scan — how much of a "plain
    text" corpus is actually markup.

    Web-scraped corpora leak markdown through readme mirrors, forum
    exports, and wiki dumps; unstripped fences and tables teach a
    model to emit stray ```-blocks in prose.  Counts the four
    telltale constructs: fenced code blocks, ATX headings, table
    rules, and inline links.

    Per (grp): (grp, n_docs, n_fence, n_heading, n_table, n_link,
    docs_any) — integer counts only (the markdown share is
    docs_any / n_docs), so the scan hashes identically on every
    engine.
    """
    t = F.col(text_col)
    fence = (F.regexp_count(t, F.lit("```")) > 0).cast("long")
    heading = (
        F.regexp_count(t, F.lit(r"(^|\n)#{1,6} ")) > 0
    ).cast("long")
    table = (
        F.regexp_count(t, F.lit(r"\|[ :]*-{3,}[ :]*\|")) > 0
    ).cast("long")
    link = (
        F.regexp_count(t, F.lit(r"\[[^\]]+\]\([^)]+\)")) > 0
    ).cast("long")
    anyc = (
        (fence + heading + table + link) > 0
    ).cast("long")
    per = docs.select(
        F.col(group_col).alias("grp"),
        fence.alias("f"),
        heading.alias("h"),
        table.alias("tb"),
        link.alias("l"),
        anyc.alias("a"),
    )
    return per.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f").alias("n_fence"),
        F.sum("h").alias("n_heading"),
        F.sum("tb").alias("n_table"),
        F.sum("l").alias("n_link"),
        F.sum("a").alias("docs_any"),
    )


LICENSE_CLASSES = (
    ("restrictive", r"all rights reserved"),
    ("cc", r"creative commons|cc by"),
    ("public_domain", r"public domain"),
    ("permissive", r"licensed under the (apache|mit|bsd)"),
)


def license_scan(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """License-phrase scan — the first-pass rights triage of a
    training corpus.

    Phrase-level license detection is how large corpus audits bucket
    documents before any real rights review (the C4/Common-Crawl
    licensing studies work exactly this way): an "all rights
    reserved" notice flags restrictive intent, Creative-Commons and
    public-domain markers flag reusable intent, and SPDX-style
    "licensed under ..." lines flag permissive code/doc licenses.
    Counts are doc-level (a doc can carry several classes).

    Per (grp): (grp, n_docs, n_restrictive, n_cc, n_public_domain,
    n_permissive, docs_marked) — integer counts only (the marked
    share is docs_marked / n_docs), so the scan hashes identically
    on every engine.
    """
    t = F.lower(F.col(text_col))
    flags = [
        (t.rlike(pat)).cast("long").alias(f"c{i}")
        for i, (_, pat) in enumerate(LICENSE_CLASSES)
    ]
    per = docs.select(F.col(group_col).alias("grp"), *flags)
    anyf = F.col("c0")
    for i in range(1, len(LICENSE_CLASSES)):
        anyf = anyf + F.col(f"c{i}")
    per = per.withColumn("a", (anyf > 0).cast("long"))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for i, (name, _) in enumerate(LICENSE_CLASSES):
        aggs.append(F.sum(f"c{i}").alias(f"n_{name}"))
    aggs.append(F.sum("a").alias("docs_marked"))
    return per.groupBy("grp").agg(*aggs)
