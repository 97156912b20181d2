"""T5 span-corruption preprocessing (Raffel et al., "Exploring the
Limits of Transfer Learning with a Unified Text-to-Text Transformer",
JMLR 2020, §3.1.4 and Figure 2).

The denoising objective that trains T5-style encoder-decoders: replace
contiguous token spans of the input with numbered sentinel tokens and
train the model to emit the dropped spans after their sentinels:

    input :  "Thank you <extra_id_0> me to your party <extra_id_1> week"
    target:  "<extra_id_0> for inviting <extra_id_1> last <extra_id_2>"

The paper samples span positions; a data *pipeline* needs the masking
to be reproducible across reruns and cluster sizes, so this module
uses a pinned arithmetic rule in place of the RNG (the standard
keyed-hash determinism trick used throughout this repo): tokens are
grouped into consecutive spans of ``span_len``; span s of document d
is masked iff ``s % cycle == d % cycle``.  With the defaults
(span_len=3, cycle=7) that corrupts 1/7 ≈ 14.3 % of tokens in mean
length-3 spans — the paper's 15 % / length-3 operating point.

Scale shape: pure Catalyst — tokenize (split), posexplode, two
``string_agg``-style ordered aggregates per doc keyed by doc_id.  No
UDFs, no windows wider than a document, no shuffle beyond the per-doc
aggregate; 10^10 docs shard on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_corrupt(
    docs: DataFrame,
    span_len: int = 3,
    cycle: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per doc: (doc_id, n_tokens, n_masked, n_spans, inputs,
    targets).  ``n_spans`` counts masked spans; ``targets`` ends with
    the terminating sentinel <extra_id_{n_spans}> per the T5 recipe."""
    toks = docs.select(
        id_col,
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("pos", "tok"),
    )
    t = toks.select(
        id_col,
        "pos",
        "tok",
        (F.col("pos") / span_len).cast("long").alias("span_id"),
    ).withColumn(
        "masked",
        (F.col("span_id") % cycle) == (F.col(id_col) % cycle),
    )
    # sentinel index: masked spans are span_id = r, r+cycle, r+2*cycle…
    # with r = doc_id % cycle, so k = (span_id - r) / cycle
    t = t.withColumn(
        "k",
        ((F.col("span_id") - F.col(id_col) % cycle) / cycle).cast("long"),
    ).withColumn("span_start", F.col("pos") % span_len == 0)

    sentinel = F.concat(F.lit("<extra_id_"), F.col("k"), F.lit(">"))
    in_piece = F.when(~F.col("masked"), F.col("tok")).when(
        F.col("span_start"), sentinel
    )
    tgt_piece = F.when(
        F.col("masked") & F.col("span_start"),
        F.concat(sentinel, F.lit(" "), F.col("tok")),
    ).when(F.col("masked"), F.col("tok"))

    per_tok = t.select(
        id_col,
        "pos",
        F.col("masked").cast("int").alias("m"),
        (F.col("masked") & F.col("span_start")).cast("int").alias("sp"),
        in_piece.alias("in_piece"),
        tgt_piece.alias("tgt_piece"),
    )

    def ordered_join(piece_col):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col(piece_col).isNotNull(),
                            F.struct("pos", F.col(piece_col).alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        )

    agg = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("m").cast("long").alias("n_masked"),
        F.sum("sp").cast("long").alias("n_spans"),
        ordered_join("in_piece").alias("inputs"),
        ordered_join("tgt_piece").alias("tgt_body"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_masked",
        "n_spans",
        "inputs",
        F.concat(
            F.when(F.col("n_spans") > 0, F.concat(F.col("tgt_body"), F.lit(" ")))
            .otherwise(F.lit("")),
            F.lit("<extra_id_"),
            F.col("n_spans"),
            F.lit(">"),
        ).alias("targets"),
    )


def fim_transform(
    docs: DataFrame,
    fim_mod: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al., "Efficient
    Training of Language Models to Fill in the Middle", 2022): for a
    deterministic half of the corpus (``doc_id % fim_mod == 0`` —
    mirroring the paper's 50% FIM rate), reorder the document into PSM
    (prefix-suffix-middle) form with sentinel tokens so an
    autoregressive model learns infilling:

        <fim_prefix> P <fim_suffix> S <fim_middle> M

    with the token split pinned at p1 = ⌊n/3⌋, p2 = ⌊2n/3⌋ (the
    deterministic stand-in for the paper's uniform split — rerun and
    cluster-size stable, like every sampling decision in this repo).
    Remaining docs pass through in AR order.

    One row per doc: (doc_id, mode, n_prefix, n_middle, n_suffix,
    out_text).  Pure Catalyst array slicing — no UDFs, no shuffle."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    d = docs.select(id_col, toks.alias("t")).select(
        id_col,
        "t",
        F.size("t").alias("n"),
        (F.col(id_col) % fim_mod == 0).alias("is_fim"),
    )
    p1 = F.floor(F.col("n") / 3).cast("int")
    p2 = F.floor(F.col("n") * 2 / 3).cast("int")
    prefix = F.slice(F.col("t"), 1, p1)
    middle = F.slice(F.col("t"), p1 + 1, p2 - p1)
    suffix = F.slice(F.col("t"), p2 + 1, F.col("n") - p2)
    psm = F.concat_ws(
        " ",
        F.lit("<fim_prefix>"),
        F.array_join(prefix, " "),
        F.lit("<fim_suffix>"),
        F.array_join(suffix, " "),
        F.lit("<fim_middle>"),
        F.array_join(middle, " "),
    )
    return d.select(
        id_col,
        F.when(F.col("is_fim"), F.lit("psm")).otherwise(F.lit("ar")).alias(
            "mode"
        ),
        F.when(F.col("is_fim"), p1).otherwise(F.col("n")).cast("int").alias(
            "n_prefix"
        ),
        F.when(F.col("is_fim"), p2 - p1).otherwise(F.lit(0)).cast("int")
        .alias("n_middle"),
        F.when(F.col("is_fim"), F.col("n") - p2).otherwise(F.lit(0))
        .cast("int").alias("n_suffix"),
        F.when(F.col("is_fim"), psm).otherwise(F.array_join("t", " ")).alias(
            "out_text"
        ),
    )
