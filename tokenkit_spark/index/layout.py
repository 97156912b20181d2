"""Term-partitioned vs document-partitioned index layout cost audit.

The first architecture decision of any distributed index (Moffat,
Webber & Zobel, "A pipelined architecture for distributed text query
evaluation", 2007; Tomasic & Garcia-Molina 1993; ES/Lucene and this
repo's build are document-partitioned): with P index servers,

* **doc layout** — every shard holds 1/P of the documents, so every
  query fans out to ALL P shards; each scans ~Σ_t df(t)/P local
  posting rows and returns a top-k candidate list for the broker to
  merge:  wall = Σ df / P + k·P,  messages = P.
* **term layout** — each term's FULL posting list lives on
  hash(term) % P; only the shards owning a query's terms are touched
  (messages = shards hit), but the slowest shard bounds latency:
  wall = max_shard Σ df(t on shard) + k·messages, and popular terms
  make hot shards.

This audit computes both models EXACTLY on the corpus per fixture
query, plus the whole-log shard balance: in the term layout the
per-shard posting traffic load factor (max shard / uniform ideal);
the doc layout splits every list 1/P by construction (factor 1.0).
The term routing hash is the repo's keyed-md5 trick
(index/routing.py:route_shard_col) — bit-identical in DuckDB.

Scale shape: a df aggregate (shared with the index build), a tiny
query relation joined against it, two hash aggregates and a union.
Nothing driver-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .routing import route_shard_col


def partition_layout_audit(
    docs: DataFrame,
    queries: DataFrame,
    n_shards: int = 8,
    k: int = 10,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """One row per layout: (layout, avg_wall_cost, avg_messages,
    max_shard_load_factor, total_scan_rows). Costs per the models
    above; OOV terms scan nothing but still cost a message in the
    term layout (the broker can't know the list is empty)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    dft = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = (
        queries.select(
            "query_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\s+"),
                        lambda x: x != "",
                    )
                )
            ).alias("term"),
        )
        .join(F.broadcast(dft), "term", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("shard", route_shard_col("term", n_shards, salt="route"))
    )
    p = float(n_shards)

    per_q = qt.groupBy("query_id").agg(F.sum("df").alias("q_df"))
    doc_rows = per_q.select(
        F.lit("doc").alias("layout"),
        (F.col("q_df") / F.lit(p) + F.lit(float(k) * p)).alias("wall"),
        F.lit(p).alias("msgs"),
        F.col("q_df").alias("scan"),
    )

    per_qs = qt.groupBy("query_id", "shard").agg(F.sum("df").alias("s"))
    term_rows = per_qs.groupBy("query_id").agg(
        F.max("s").alias("max_s"),
        F.count(F.lit(1)).cast("double").alias("msgs"),
        F.sum("s").alias("scan"),
    ).select(
        F.lit("term").alias("layout"),
        (F.col("max_s") + F.lit(float(k)) * F.col("msgs")).alias("wall"),
        "msgs",
        "scan",
    )

    shard_tot = qt.groupBy("shard").agg(F.sum("df").alias("tot"))
    term_balance = shard_tot.agg(
        (F.max("tot") / (F.sum("tot") / F.lit(p))).alias("load_factor")
    ).select(F.lit("term").alias("layout"), "load_factor")
    doc_balance = docs.sparkSession.createDataFrame(
        [("doc", 1.0)], "layout string, load_factor double"
    )

    costs = (
        doc_rows.unionByName(term_rows)
        .groupBy("layout")
        .agg(
            F.avg("wall").alias("avg_wall"),
            F.avg("msgs").alias("avg_msgs"),
            F.sum("scan").alias("total_scan"),
        )
    )
    return (
        costs.join(term_balance.unionByName(doc_balance), "layout")
        .select(
            "layout",
            F.round("avg_wall", round_digits).alias("avg_wall_cost"),
            F.round("avg_msgs", round_digits).alias("avg_messages"),
            F.round("load_factor", round_digits).alias(
                "max_shard_load_factor"
            ),
            F.col("total_scan").cast("long").alias("total_scan_rows"),
        )
        .orderBy("layout")
    )


def positional_overhead_audit(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Positional-index storage overhead vs a docs-only index, exact
    varint bytes per term.

    IIR §2.4.2 (Manning et al.): storing within-document positions —
    required for phrase and proximity queries — costs "2-4x" a
    docs-only index as a rule of thumb.  This audit replaces the rule
    of thumb with exact numbers on the corpus, using the live codec's
    layout: per term, the docs-only stream is delta+varint doc-id
    gaps + a tf varint per doc; the positional stream adds, per
    (term, doc), the delta+varint position gaps (positions are
    1-based token offsets in the filtered token sequence, first gap =
    the position itself).

    Top-``k`` terms by df: (rank, term, df, n_positions, doc_bytes,
    pos_bytes, total_bytes, overhead_x).

    Scale shape: one posexplode pass, two (term[, doc])-keyed lag
    windows, one rollup — the same skeleton as the codec audits.
    """
    from pyspark.sql import Window

    from tokenkit_spark.index.reorder import varint_len

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("pos0", "term"),
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))
    # positional stream: gaps within (term, doc)
    wp = Window.partitionBy("term", "doc_id").orderBy("pos")
    pos_bytes = (
        toks.withColumn(
            "gap",
            F.col("pos")
            - F.coalesce(F.lag("pos").over(wp), F.lit(0)),
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_positions"),
            F.sum(varint_len(F.col("gap"))).alias("pos_bytes"),
        )
    )
    # docs-only stream: doc-id gaps + tf varints
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    wd = Window.partitionBy("term").orderBy("doc_id")
    doc_bytes = (
        postings.withColumn(
            "dgap",
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id").over(wd), F.lit(0)),
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum(
                varint_len(F.col("dgap")) + varint_len(F.col("tf"))
            ).alias("doc_bytes"),
        )
    )
    sized = doc_bytes.join(pos_bytes, "term")
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        sized.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "term",
            "df",
            "n_positions",
            "doc_bytes",
            "pos_bytes",
            (F.col("doc_bytes") + F.col("pos_bytes")).alias(
                "total_bytes"
            ),
            F.round(
                (F.col("doc_bytes") + F.col("pos_bytes"))
                / F.col("doc_bytes").cast("double"),
                round_digits,
            ).alias("overhead_x"),
        )
    )


def rle_layout_audit(
    rows: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Run-length-encoding payoff of sorting a columnar file by a
    low-cardinality column.

    The doc-values/Parquet layout decision in its purest form
    (Abadi, Madden & Ferreira, "Integrating compression and execution
    in column-oriented database systems", SIGMOD 2006): RLE run count
    == number of value CHANGES along the storage order, so a column
    sorted by itself compresses to ~cardinality runs while the same
    column in docid order carries ~n * (1 - sum p_i^2) expected
    changes.  Exact run counts under both orders plus the
    Abadi-style expected-run model:

        (n_rows, n_distinct, runs_docid, runs_sorted, expected_runs,
         rle_gain)

    with rle_gain = runs_docid / runs_sorted.  One lag window per
    order over the projection — the audit is itself scan-shaped.
    """
    from pyspark.sql import Window

    v = rows.select(
        F.col(id_col).alias("id"), F.col(value_col).alias("v")
    )
    n = v.count()

    def runs(order_cols):
        w = Window.orderBy(*order_cols)
        return (
            v.withColumn("pv", F.lag("v").over(w))
            .select(
                (
                    F.col("pv").isNull()
                    | (F.col("pv") != F.col("v"))
                ).cast("long").alias("chg")
            )
            .agg(F.sum("chg").alias("r"))
            .collect()[0]
            .r
        )

    runs_docid = runs([F.col("id").asc()])
    runs_sorted = runs([F.col("v").asc(), F.col("id").asc()])
    probs = (
        v.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                (F.col("c") / F.lit(float(n)))
                * (F.col("c") / F.lit(float(n)))
            ).alias("p2"),
        )
        .collect()[0]
    )
    expected = 1.0 + (n - 1) * (1.0 - probs.p2)
    spark = rows.sparkSession
    return spark.createDataFrame(
        [
            (
                n,
                probs.n_distinct,
                runs_docid,
                runs_sorted,
                round(expected, round_digits),
                round(runs_docid / runs_sorted, round_digits),
            )
        ],
        "n_rows long, n_distinct long, runs_docid long, "
        "runs_sorted long, expected_runs double, rle_gain double",
    )


def stopword_ablation_audit(
    docs: DataFrame,
    stopwords,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Stopword-removal index ablation — exact size impact of the
    classic space/function trade.

    IIR §2.2.2's "rule of 30" (the 30 commonest words are ~30% of
    postings) made exact on this corpus: build the postings relation
    with and without the stopword list and compare term count,
    posting count, and the live codec's delta+varint doc-gap bytes.
    What the saved third costs is phrase/proximity fidelity ("to be
    or not to be") — which is why modern engines keep stopwords and
    spend the bytes; this audit prices the decision instead of
    asserting it.

    Two rows: (variant, n_terms, n_postings, varint_bytes,
    frac_of_full_postings, frac_of_full_bytes).
    """
    from pyspark.sql import Window

    from tokenkit_spark.index.reorder import varint_len

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    stop = [s for s in stopwords]

    def stats(t):
        p = t.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
        wt = Window.partitionBy("term").orderBy("doc_id")
        g = p.withColumn(
            "gap",
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id").over(wt), F.lit(0)),
        )
        return g.agg(
            F.countDistinct("term").alias("n_terms"),
            F.count(F.lit(1)).alias("n_postings"),
            F.sum(varint_len(F.col("gap"))).alias("varint_bytes"),
        ).collect()[0]

    full = stats(toks)
    nostop = stats(toks.filter(~F.col("term").isin(stop)))
    spark = docs.sparkSession
    rows = []
    for name, r in (("full", full), ("no_stopwords", nostop)):
        rows.append(
            (
                name,
                r.n_terms,
                r.n_postings,
                int(r.varint_bytes),
                round(r.n_postings / full.n_postings, round_digits),
                round(
                    r.varint_bytes / full.varint_bytes, round_digits
                ),
            )
        )
    return spark.createDataFrame(
        rows,
        "variant string, n_terms long, n_postings long, "
        "varint_bytes long, frac_of_full_postings double, "
        "frac_of_full_bytes double",
    )


RG_SIZES_MB = (8, 32, 128, 512)


def rowgroup_plan(
    docs: DataFrame,
    bytes_col: str = "n_chars",
    max_partition_mb: float = 128.0,
    round_digits: int = 6,
) -> DataFrame:
    """Parquet row-group sizing plan — tasks, lookup amplification,
    and tail balance per candidate size.

    The two-sided trade every columnar layout tunes (the Parquet docs'
    own guidance, quantified on this corpus): LARGE row groups
    amortize footer/dictionary overhead and keep scans sequential,
    but a point lookup must read ~half a row group (read
    amplification) and a task can't split below one group (fewer,
    lumpier tasks — Spark's ``files.maxPartitionBytes`` clamps to
    whole groups).  For each candidate size:

        n_rowgroups      = ceil(total_bytes / rg)
        scan_tasks       = ceil(total_bytes / min(rg, max_partition))
        lookup_read_mb   = rg / 2
        last_group_fill  = remainder fraction of the final group

    One row per candidate size; total_bytes measured from
    ``bytes_col``.
    """
    import math

    total = docs.agg(F.sum(bytes_col).alias("b")).collect()[0].b
    total = int(total)
    spark = docs.sparkSession
    rows = []
    for mb in RG_SIZES_MB:
        rg = mb * 1024 * 1024
        n_rg = max(1, math.ceil(total / rg))
        eff = min(rg, max_partition_mb * 1024 * 1024)
        tasks = max(1, math.ceil(total / eff))
        rem = total - (n_rg - 1) * rg
        rows.append(
            (
                mb,
                total,
                n_rg,
                tasks,
                round(mb / 2.0, round_digits),
                round(rem / rg, round_digits),
            )
        )
    return spark.createDataFrame(
        rows,
        "rowgroup_mb long, total_bytes long, n_rowgroups long, "
        "scan_tasks long, lookup_read_mb double, "
        "last_group_fill double",
    )


PRUNE_RANGES = (
    ("one_day", "2024-01-10", "2024-01-10"),
    ("one_week", "2024-01-08", "2024-01-14"),
    ("full_month", "2024-01-01", "2024-01-31"),
)


def partition_pruning_audit(
    events,
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Date-partition pruning payoff — partitions and rows a range
    predicate actually touches.

    The first scan optimization every lakehouse layout buys (Hive-
    style day partitioning + Spark's partition pruning; the dynamic
    variant the AQE docs describe): a predicate on the partition
    column prunes whole directories BEFORE any I/O.  For each pinned
    query range, report partitions touched vs total and rows read vs
    total — the speedup ceiling the layout gives that query class
    (and the argument for day over month granularity when ranges are
    short).

    Per range: (range_name, partitions_touched, partitions_total,
    rows_read, rows_total, row_selectivity, partition_selectivity).
    """
    day = F.to_date(F.col(ts_col))
    per_day = events.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = per_day.agg(
        F.count(F.lit(1)).alias("p"), F.sum("n").alias("r")
    ).collect()[0]
    spark = events.sparkSession
    rows = []
    for name, lo, hi in PRUNE_RANGES:
        hit = per_day.filter(
            (F.col("day") >= F.lit(lo).cast("date"))
            & (F.col("day") <= F.lit(hi).cast("date"))
        ).agg(
            F.count(F.lit(1)).alias("p"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("r"),
        ).collect()[0]
        rows.append(
            (
                name,
                int(hit.p),
                int(tot.p),
                int(hit.r),
                int(tot.r),
                round(hit.r / tot.r, round_digits),
                round(hit.p / tot.p, round_digits),
            )
        )
    return spark.createDataFrame(
        rows,
        "range_name string, partitions_touched long, "
        "partitions_total long, rows_read long, rows_total long, "
        "row_selectivity double, partition_selectivity double",
    )


def dict_encoding_plan(
    events,
    columns=("event_type", "user_id"),
    round_digits: int = 6,
) -> DataFrame:
    """Dictionary-encoding payoff per column — the Parquet/doc-values
    encoding decision, priced.

    The columnar-encoding rule (Abadi SIGMOD 2006 again, and what
    Parquet's writer decides per chunk): a column with d distinct
    values needs ceil(log2(d)) bits per value dictionary-encoded vs
    its plain width; the ratio times the row count is the bytes the
    encoding saves BEFORE general-purpose compression.  Low-
    cardinality string columns (hosts, types, langs) are where the
    10-100x wins live — this table shows which.

    Per column: (column, n_rows, n_distinct, dict_bits_per_value,
    plain_bits_per_value, compression_ratio).  Plain width: 64 for
    numerics, 8 * avg string length for strings.
    """
    import math

    spark = events.sparkSession
    rows = []
    n_rows = events.count()
    for c in columns:
        dt_name = dict(events.dtypes)[c]
        stats = events.agg(
            F.countDistinct(c).alias("d"),
            F.avg(F.length(F.col(c).cast("string"))).alias("alen"),
        ).collect()[0]
        d = int(stats.d)
        dict_bits = max(1, math.ceil(math.log2(max(d, 2))))
        plain_bits = (
            64.0 if dt_name in ("bigint", "int", "double")
            else 8.0 * float(stats.alen)
        )
        rows.append(
            (
                c,
                n_rows,
                d,
                dict_bits,
                round(plain_bits, round_digits),
                round(plain_bits / dict_bits, round_digits),
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, n_rows long, n_distinct long, "
        "dict_bits_per_value long, plain_bits_per_value double, "
        "compression_ratio double",
    )
