"""The remaining Elasticsearch aggregation family, Spark-first.

The reference (scientist-labs/tokenkit) positions itself as the analysis
layer of an ES-style search stack (reference: README.md:509-553); the
engine here already covers terms/date_histogram/percentiles/extended_stats/
cardinality/top_hits/significant_terms.  This module adds the rest of the
agg surface a search cluster exposes over the same tables:

* ``rare_terms``          — long-tail terms with df <= max_doc_count
* ``adjacency_matrix``    — named-filter intersection counts (A, B, A&B)
* ``composite_agg``       — multi-source paged buckets with after-key
* ``top_metrics``         — metric value at the sort-field extreme per bucket
* ``matrix_stats``        — count/mean/variance/covariance/correlation
* ``string_stats``        — length stats + Shannon char entropy (show_distribution)
* ``boxplot``             — min/q1/q2/q3/max (exact interpolated quantiles)
* ``range_agg``           — explicit [from, to) value buckets
* ``diversified_sampler`` — per-bucket-capped deterministic sample
* ``weighted_avg``        — value weighted by a second expression
* ``serial_diff``         — pipeline agg: lagged difference over buckets
* ``bucket_selector_sort``— pipeline agg: HAVING-filter + bucket_sort page

Scale notes:

* Everything below is a pure Catalyst plan — hash aggregates with map-side
  partials, window functions over bucket keys (bucket cardinality, not row
  cardinality), no Python workers and no driver collects.  Pipeline aggs
  (serial_diff / bucket_selector / bucket_sort) run over the *aggregated*
  bucket stream, so their window passes see one row per bucket — at
  10^12 input rows the shuffled volume is the bucket count.
* ``rare_terms`` is the one agg ES itself documents as approximate at
  scale (CuckooFilter); the exact groupBy form here is the oracle twin
  and is already distributed — the df <= k filter happens post-aggregate
  where the data is one row per term.
* ``string_stats`` entropy explodes characters; at corpus scale the
  per-char explode is a map-side expression feeding a 1-row-per-codepoint
  aggregate — bounded by alphabet size after the partial combine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rare_terms(
    tokens: DataFrame,
    max_doc_count: int = 2,
    term_col: str = "term",
    doc_col: str = "doc_id",
    limit: int = 100,
) -> DataFrame:
    """ES ``rare_terms`` agg: terms appearing in at most ``max_doc_count``
    docs, rarest first.  Input is the exploded (doc_id, term) relation."""
    return (
        tokens.groupBy(term_col)
        .agg(F.countDistinct(doc_col).alias("df"))
        .where(F.col("df") <= max_doc_count)
        .orderBy(F.col("df").asc(), F.col(term_col).asc())
        .limit(limit)
    )


def adjacency_matrix(
    docs_flags: DataFrame, filter_names: list[str], doc_col: str = "doc_id"
) -> DataFrame:
    """ES ``adjacency_matrix`` agg: doc counts for every named filter and
    every pairwise intersection, keyed ES-style ("a", "a&b" with names in
    sorted order).  ``docs_flags`` carries one boolean column per filter
    name.  One single-pass hash aggregate: each conditional count is a
    map-side expression, so the shuffle is one row per map task."""
    names = sorted(filter_names)
    aggs = []
    keys = []
    for i, a in enumerate(names):
        keys.append(a)
        aggs.append(F.sum(F.col(a).cast("long")).alias(f"_{len(aggs)}"))
        for b in names[i + 1 :]:
            keys.append(f"{a}&{b}")
            aggs.append(
                F.sum((F.col(a) & F.col(b)).cast("long")).alias(f"_{len(aggs)}")
            )
    row = docs_flags.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.col(f"_{i}").alias("doc_count"))
            for i, k in enumerate(keys)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("b"))
        .select("b.key", "b.doc_count")
        .where(F.col("doc_count") > 0)
    )


def composite_agg(
    df: DataFrame,
    sources: list[tuple],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """ES ``composite`` agg: buckets over the cross of ``sources`` —
    (name, column-expression) pairs — ordered by the full source tuple,
    paged with an ``after`` key (exclusive).  The page cut is a
    post-aggregate sort+limit over bucket rows — never over raw rows."""
    names = [n for n, _ in sources]
    buckets = df.groupBy(
        *[expr.alias(n) for n, expr in sources]
    ).agg(F.count(F.lit(1)).alias("doc_count"))
    if after is not None:
        # lexicographic "greater than after-key" predicate
        cond = None
        prefix = None
        for name, val in zip(names, after):
            gt = F.col(name) > F.lit(val)
            this = gt if prefix is None else prefix & gt
            cond = this if cond is None else cond | this
            eq = F.col(name) == F.lit(val)
            prefix = eq if prefix is None else prefix & eq
        buckets = buckets.where(cond)
    return buckets.orderBy(*[F.col(n).asc() for n in names]).limit(size)


def top_metrics(
    df: DataFrame,
    group_col: str,
    sort_col: str,
    metric_col: str,
    tiebreak_col: str,
    descending: bool = True,
) -> DataFrame:
    """ES ``top_metrics`` agg: per bucket, the value of ``metric_col`` on
    the row where ``sort_col`` is extreme.  max_by/min_by keeps it a
    single hash aggregate (no window, no self-join)."""
    key = F.struct(F.col(sort_col), F.col(tiebreak_col))
    pick = F.max_by(F.col(metric_col), key) if descending else F.min_by(
        F.col(metric_col), key
    )
    top = (F.max(F.col(sort_col)) if descending else F.min(F.col(sort_col)))
    return df.groupBy(group_col).agg(
        top.alias("top_sort"), pick.alias("top_metric")
    )


def matrix_stats(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """ES ``matrix_stats`` agg (two-field form): per bucket count, means,
    population variances, covariance and Pearson correlation.  All of
    these are single-pass commutative aggregates (sufficient statistics
    merge map-side)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(x_col), 4).alias("mean_x"),
        F.round(F.avg(y_col), 4).alias("mean_y"),
        F.round(F.var_pop(x_col), 4).alias("var_x"),
        F.round(F.var_pop(y_col), 4).alias("var_y"),
        F.round(F.covar_pop(x_col, y_col), 4).alias("covariance"),
        F.round(F.corr(x_col, y_col), 4).alias("correlation"),
    )


def string_stats(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """ES ``string_stats`` agg with show_distribution semantics folded to
    its headline number: per bucket count / min / max / avg length plus
    the Shannon entropy (bits) of the character distribution.

    The char explode is a map-side expression; after the partial
    aggregate the shuffle carries (bucket, codepoint) rows — bounded by
    alphabet size per bucket, not corpus size."""
    lens = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("count"),
        F.min(F.length(text_col)).alias("min_length"),
        F.max(F.length(text_col)).alias("max_length"),
        F.round(F.avg(F.length(text_col)), 4).alias("avg_length"),
    )
    chars = df.select(
        group_col, F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).where(F.col("ch") != "")
    dist = chars.groupBy(group_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = Window.partitionBy(group_col)
    ent = (
        dist.withColumn("p", F.col("c") / F.sum("c").over(tot))
        .groupBy(group_col)
        .agg(F.round(-F.sum(F.col("p") * F.log2("p")), 4).alias("entropy"))
    )
    return lens.join(ent, group_col)


def boxplot(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """ES ``boxplot`` agg: min/q1/q2/q3/max per bucket with exact
    linear-interpolation quantiles (the TDigest form is the 10^12-row
    variant; this exact form is the oracle twin, same shape as the
    existing percentiles_facet)."""
    q = F.percentile(value_col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return df.groupBy(group_col).agg(
        F.round(F.min(value_col), 4).alias("min_v"),
        F.round(q[0], 4).alias("q1"),
        F.round(q[1], 4).alias("q2"),
        F.round(q[2], 4).alias("q3"),
        F.round(F.max(value_col), 4).alias("max_v"),
    )


def range_agg(
    df: DataFrame, value_col: str, bounds: list[tuple], group_col: str | None = None
) -> DataFrame:
    """ES ``range`` agg: explicit [from, to) buckets (None = open end),
    ES key format "from-to".  A doc can land in overlapping ranges, so
    each bound is its own conditional count in ONE aggregate pass."""
    aggs = []
    keys = []
    for lo, hi in bounds:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(value_col) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(value_col) < F.lit(hi))
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        keys.append(key)
        aggs.append(F.sum(cond.cast("long")).alias(f"_{len(aggs)}"))
    gb = df.groupBy(group_col) if group_col else df.groupBy()
    row = gb.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("range_key"), F.col(f"_{i}").alias("doc_count"))
            for i, k in enumerate(keys)
        ]
    )
    cols = ([group_col] if group_col else []) + [F.explode(pairs).alias("b")]
    out = row.select(*cols)
    keep = ([group_col] if group_col else []) + ["b.range_key", "b.doc_count"]
    return out.select(*keep)


def diversified_sampler(
    df: DataFrame,
    diversity_col: str,
    order_col: str,
    max_docs_per_value: int,
    shard_size: int,
) -> DataFrame:
    """ES ``diversified_sampler`` agg, deterministic form: keep at most
    ``max_docs_per_value`` rows per diversity value (best-first by
    ``order_col``), then the overall best ``shard_size`` rows.  One
    window pass partitioned by the diversity key (per-key cardinality,
    not corpus cardinality), then a global top-N — the standard
    rank-then-limit shape AQE handles with a partial top-N per
    partition."""
    w = Window.partitionBy(diversity_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_dv_rank", F.row_number().over(w))
        .where(F.col("_dv_rank") <= max_docs_per_value)
        .drop("_dv_rank")
        .orderBy(F.col(order_col).asc())
        .limit(shard_size)
    )


def weighted_avg(
    df: DataFrame, group_col: str, value_col, weight_col
) -> DataFrame:
    """ES ``weighted_avg`` agg: sum(v*w)/sum(w) per bucket; single-pass."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.groupBy(group_col).agg(
        F.round(F.sum(v * w) / F.sum(w), 4).alias("weighted_avg"),
        F.count(F.lit(1)).alias("n"),
    )


def serial_diff(
    buckets: DataFrame, bucket_col: str, value_col: str, lag: int = 1
) -> DataFrame:
    """ES ``serial_diff`` pipeline agg: value minus the value ``lag``
    buckets earlier, over the ordered bucket stream (one row per bucket
    — the window sees bucket cardinality)."""
    w = Window.orderBy(bucket_col)
    return buckets.select(
        bucket_col,
        F.col(value_col),
        F.round(F.col(value_col) - F.lag(value_col, lag).over(w), 4).alias(
            f"diff_{lag}"
        ),
    ).where(F.col(f"diff_{lag}").isNotNull())


def bucket_selector_sort(
    buckets: DataFrame,
    value_col: str,
    min_value: float,
    sort_desc: bool = True,
    size: int = 10,
) -> DataFrame:
    """ES ``bucket_selector`` + ``bucket_sort`` pipeline aggs: drop
    buckets failing the script predicate, then sort and truncate the
    bucket stream."""
    out = buckets.where(F.col(value_col) >= F.lit(min_value))
    order = F.col(value_col).desc() if sort_desc else F.col(value_col).asc()
    return out.orderBy(order, *[c for c in buckets.columns if c != value_col]).limit(
        size
    )


def multi_terms(
    df: DataFrame, key_cols: list[str], size: int = 10
) -> DataFrame:
    """ES ``multi_terms`` agg: buckets keyed by a composite term tuple,
    ordered doc_count desc then keys asc, top ``size``. One hash
    aggregate (map-side combinable); the orderBy sees only bucket
    cardinality."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(size)
    )


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_parent_key: str,
    child_value_col: str,
    min_children: int = 1,
) -> DataFrame:
    """ES join-field ``has_child`` query with ``min_children``: parents
    having at least ``min_children`` (pre-filtered) children, plus the
    child count and max child value (inner_hits-style rollup).

    Scale shape: children aggregate FIRST (map-side combinable groupBy
    on the parent key — the ES routing-key analog: children co-shard
    with parents), then one equi-join against parents; no fan-out join
    of raw children against parents ever happens.
    """
    rollup = (
        children.groupBy(F.col(child_parent_key).alias(parent_key))
        .agg(
            F.count(F.lit(1)).alias("n_children"),
            F.round(F.max(child_value_col), 4).alias("max_child_value"),
        )
        .filter(F.col("n_children") >= min_children)
    )
    return parents.join(rollup, parent_key)


def percentile_ranks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    values: list[float],
) -> DataFrame:
    """ES ``percentile_ranks`` agg: for each supplied threshold, the
    percentage of observations in the bucket that are <= it.  ES runs
    this on a t-digest sketch (approximate); this is the exact form —
    the oracle twin — and the exact definition the sketch approximates:
    ``rank(v) = 100 * count(x <= v) / count(*)``.

    Scale shape: one conditional-sum hash aggregate per bucket (the
    threshold list unrolls into len(values) map-side counters — no
    per-threshold pass, no sort, no percentile shuffle).  At sketch
    scale a t-digest UDAF would slot in behind the same output schema.
    Output long-form: (group, threshold, pct_rank)."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum((F.col(value_col) <= F.lit(float(v))).cast("long")).alias(f"_le_{i}")
        for i, v in enumerate(values)
    ]
    bucketed = df.groupBy(group_col).agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(v)).alias("threshold"),
                    F.round(F.col(f"_le_{i}") * 100.0 / F.col("_n"), 6).alias(
                        "pct_rank"
                    ),
                )
                for i, v in enumerate(values)
            ]
        )
    ).alias("pr")
    return (
        bucketed.select(group_col, pairs)
        .select(group_col, "pr.threshold", "pr.pct_rank")
        .orderBy(F.col(group_col).asc(), F.col("threshold").asc())
    )


def median_abs_deviation(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """ES ``median_absolute_deviation`` agg: median(|x - median(x)|) per
    bucket — the robust dispersion metric.  ES approximates both medians
    with t-digests; this is the exact interpolated-median form (the
    oracle twin, matching DuckDB ``quantile_cont(.., 0.5)``).

    Scale shape: two aggregates on the SAME group key — the per-bucket
    median, broadcast-joined back (one row per bucket), then the median
    of deviations.  Both percentile aggregates are Catalyst built-ins;
    the join side is bucket-cardinality so it broadcasts at any corpus
    size."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    return (
        df.join(F.broadcast(med), group_col)
        .withColumn("_dev", F.abs(F.col(value_col) - F.col("_med")))
        .groupBy(group_col)
        .agg(F.round(F.expr("percentile(_dev, 0.5)"), 6).alias("mad"))
        .orderBy(F.col(group_col).asc())
    )


def cumulative_sum_buckets(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    interval: str = "day",
) -> DataFrame:
    """ES ``cumulative_sum`` pipeline agg over a ``date_histogram``:
    per-bucket sum plus the running total across buckets in time order.

    Scale shape: one hash aggregate down to bucket cardinality, then an
    unpartitioned running-sum window over the bucket stream — one row
    per calendar bucket, so the single-partition window is bounded by
    the date range, not the corpus."""
    buckets = (
        df.groupBy(F.date_trunc(interval, F.col(ts_col)).alias("bucket"))
        .agg(F.round(F.sum(value_col), 6).alias("bucket_sum"))
    )
    w = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        buckets.withColumn("cumulative", F.round(F.sum("bucket_sum").over(w), 6))
        .orderBy(F.col("bucket").asc())
    )


# the ES auto_date_histogram rounding ladder (coarse form): interval
# name -> nominal seconds used ONLY to pick the coarsest-fitting rung;
# bucketing itself is calendar date_trunc, exactly as ES rounds.
_AUTO_DH_LADDER = [
    ("minute", 60),
    ("hour", 3600),
    ("day", 86400),
    ("month", 30 * 86400),
    ("year", 365 * 86400),
]


def auto_date_histogram(
    df: DataFrame, ts_col: str, target_buckets: int = 10
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the smallest calendar interval
    from the rounding ladder whose bucket count stays <= ``target_buckets``
    (falling back to the coarsest rung), then bucket with calendar
    truncation.  Output: (chosen_interval, bucket, doc_count).

    Scale shape: the span probe is a one-row min/max aggregate that
    broadcasts back into the plan (no driver decision, no second scan
    branch at runtime — the CASE over rungs folds per-row), then one
    hash aggregate at bucket cardinality."""
    span = df.agg(
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("_span_s")
    )
    interval = F.lit(_AUTO_DH_LADDER[-1][0])
    for name, secs in reversed(_AUTO_DH_LADDER[:-1]):
        interval = F.when(
            F.col("_span_s") / F.lit(secs) <= F.lit(target_buckets), F.lit(name)
        ).otherwise(interval)
    with_iv = df.crossJoin(F.broadcast(span.select(interval.alias("interval"))))
    bucket = F.coalesce(
        *[
            F.when(
                F.col("interval") == name, F.date_trunc(name, F.col(ts_col))
            )
            for name, _ in _AUTO_DH_LADDER
        ]
    )
    return (
        with_iv.groupBy(F.col("interval"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("bucket").asc())
    )


def t_test_welch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """ES ``t_test`` agg (heteroscedastic / Welch form): the t statistic
    between two populations' values plus the Welch-Satterthwaite degrees
    of freedom.  ES reports the p-value derived from exactly these two
    numbers via the Student-t CDF; the statistic + dof are returned here
    (the CDF is not a SQL primitive — the mapping to p is monotone and
    deterministic given dof, applied client-side).

    Scale shape: one conditional hash aggregate over the filtered union
    of both populations — count/mean/var_samp per side as map-side
    partials; the t arithmetic runs on the single combined row."""
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    stats = df.filter(in_a | in_b).agg(
        F.sum(in_a.cast("long")).alias("n_a"),
        F.avg(F.when(in_a, F.col(value_col))).alias("mean_a"),
        F.var_samp(F.when(in_a, F.col(value_col))).alias("var_a"),
        F.sum(in_b.cast("long")).alias("n_b"),
        F.avg(F.when(in_b, F.col(value_col))).alias("mean_b"),
        F.var_samp(F.when(in_b, F.col(value_col))).alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se_a + se_b)
    dof = (se_a + se_b) * (se_a + se_b) / (
        se_a * se_a / (F.col("n_a") - 1) + se_b * se_b / (F.col("n_b") - 1)
    )
    return stats.select(
        F.col("n_a"),
        F.round("mean_a", 6).alias("mean_a"),
        F.col("n_b"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 4).alias("dof"),
    )


def date_range_agg(
    df: DataFrame,
    ts_col: str,
    ranges: list[tuple],
    group_col: str | None = None,
) -> DataFrame:
    """ES ``date_range`` agg: explicit [from, to) timestamp buckets —
    ``from`` inclusive, ``to`` exclusive, either end open (None), ES key
    format ``from-to`` with ``*`` for open ends. Ranges may overlap, as
    in ES. Output: (group?, range_key, doc_count).

    Scale shape: like :func:`range_agg` — every range unrolls into one
    conditional map-side counter inside a single hash aggregate."""
    ts = F.col(ts_col).cast("timestamp")
    aggs = []
    keys = []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ts >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (ts < F.lit(hi).cast("timestamp"))
        key = f"{lo or '*'}-{hi or '*'}"
        keys.append(key)
        aggs.append(F.sum(cond.cast("long")).alias(f"_{len(aggs)}"))
    grouped = df.groupBy(group_col).agg(*aggs) if group_col else df.agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("range_key"),
                    F.col(f"_{i}").alias("doc_count"),
                )
                for i, k in enumerate(keys)
            ]
        )
    ).alias("b")
    head = [group_col] if group_col else []
    return (
        grouped.select(*head, pairs)
        .select(*head, "b.range_key", "b.doc_count")
        .where(F.col("doc_count") > 0)
    )


def bucket_script(
    buckets: DataFrame, script_sql: str, out_col: str
) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: a per-bucket arithmetic
    expression over sibling metrics of the SAME bucket (e.g. an error
    rate from an error count and a total). The script is a SQL
    expression over the bucket frame's metric columns, evaluated by
    Catalyst — pure projection over the aggregated bucket stream, one
    row per bucket, no second scan."""
    return buckets.withColumn(out_col, F.expr(script_sql))


def normalize_buckets(
    buckets: DataFrame,
    value_col: str,
    method: str = "percent_of_sum",
    out_col: str = "normalized",
) -> DataFrame:
    """ES ``normalize`` pipeline agg: rescale a metric across the bucket
    stream. Methods (ES names): ``percent_of_sum`` (v / sum),
    ``rescale_0_1`` ((v - min) / (max - min)), ``mean`` ((v - avg) /
    (max - min), ES's z-ish variant), ``z-score`` ((v - avg) / stddev_pop).

    Scale shape: one unpartitioned window over the AGGREGATED bucket
    stream — bucket cardinality, not row cardinality; the single
    partition is bounded by the histogram's bucket count."""
    w = Window.partitionBy()
    v = F.col(value_col)
    if method == "percent_of_sum":
        norm = v / F.sum(v).over(w)
    elif method == "rescale_0_1":
        norm = (v - F.min(v).over(w)) / (F.max(v).over(w) - F.min(v).over(w))
    elif method == "mean":
        norm = (v - F.avg(v).over(w)) / (F.max(v).over(w) - F.min(v).over(w))
    elif method == "z-score":
        norm = (v - F.avg(v).over(w)) / F.stddev_pop(v).over(w)
    else:
        raise ValueError(f"normalize_buckets: unknown method {method!r}")
    return buckets.withColumn(out_col, F.round(norm, 6))


def stats_bucket(buckets: DataFrame, value_col: str) -> DataFrame:
    """ES ``stats_bucket`` sibling pipeline agg (and the avg/min/max/
    sum_bucket family it subsumes): count/min/max/avg/sum of a metric
    ACROSS all buckets of a histogram. One row out; one aggregate over
    the bucket stream."""
    v = F.col(value_col)
    return buckets.agg(
        F.count(v).alias("count"),
        F.round(F.min(v), 6).alias("min"),
        F.round(F.max(v), 6).alias("max"),
        F.round(F.avg(v), 6).alias("avg"),
        F.round(F.sum(v), 6).alias("sum"),
    )


def filters_agg(
    df: DataFrame,
    named_filters: dict[str, str],
    other_bucket: bool = True,
) -> DataFrame:
    """ES ``filters`` agg: one named bucket per filter expression (SQL
    predicate strings, evaluated as Catalyst expressions), plus the ES
    ``other_bucket`` of rows matching none.  Buckets overlap when
    filters do, exactly as in ES.  Output: (bucket, doc_count).

    Scale shape: every filter unrolls into one conditional map-side
    counter inside a single aggregate — one scan regardless of filter
    count, no per-bucket pass."""
    preds = {name: F.expr(sql) for name, sql in named_filters.items()}
    aggs = [
        F.sum(p.cast("long")).alias(name) for name, p in preds.items()
    ]
    if other_bucket:
        none_match = ~preds[next(iter(preds))]
        for p in list(preds.values())[1:]:
            none_match = none_match & ~p
        aggs.append(F.sum(none_match.cast("long")).alias("_other_"))
    counts = df.agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(c).alias("bucket"), F.col(c).alias("doc_count"))
                for c in counts.columns
            ]
        )
    ).alias("b")
    return (
        counts.select(pairs)
        .select("b.bucket", "b.doc_count")
        .orderBy(F.col("bucket").asc())
    )


def ip_to_long(ip) -> "F.Column":
    """Dotted-quad IPv4 string -> unsigned 32-bit value as a long —
    pure Catalyst (split + Horner fold), the key both ip_range
    bucketing and CIDR prefix matching reduce to."""
    col = F.col(ip) if isinstance(ip, str) else ip
    return F.aggregate(
        F.transform(F.split(col, r"\."), lambda o: o.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, o: acc * 256 + o,
    )


def ip_range_agg(
    df: DataFrame,
    ip_col: str,
    ranges: list[tuple[str, str | None, str | None]],
) -> DataFrame:
    """ES ip_range agg: (key, from_ip, to_ip) buckets with the ES
    half-open contract [from, to); a None end is unbounded. A row can
    land in several overlapping buckets (ES semantics), so buckets are
    evaluated as independent conditional counts in ONE aggregate pass —
    no explode, no join. Returns (key, doc_count) in the given order."""

    def as_long(s):
        return ip_to_long(F.lit(s))

    v = ip_to_long(ip_col)
    aggs = []
    for key, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (v >= as_long(lo))
        if hi is not None:
            cond = cond & (v < as_long(hi))
        aggs.append(F.sum(cond.cast("long")).alias(key))
    wide = df.agg(*aggs)
    keys = [k for k, _, _ in ranges]
    return wide.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(k) for k in keys]).alias("k"),
                F.array(*[F.coalesce(F.col(k), F.lit(0)) for k in keys]).alias("n"),
            )
        ).alias("b")
    ).select(F.col("b").getField("k").alias("key"),
             F.col("b").getField("n").alias("doc_count"))


def sampler_top(
    df: DataFrame,
    score_col: str,
    shard_size: int,
    tiebreak_col: str,
) -> DataFrame:
    """ES sampler agg: restrict sub-aggregations to the ``shard_size``
    highest-scoring docs. ES samples per shard; the deterministic
    contract here is global top-N (score desc, tiebreak asc) computed
    the scalable way — per-partition top-N first (sort within
    partitions is a local heap, no shuffle), then one narrow top-N over
    the per-partition survivors."""
    ordered = (
        df.sortWithinPartitions(F.col(score_col).desc(), F.col(tiebreak_col).asc())
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy(F.spark_partition_id()).orderBy(
                    F.col(score_col).desc(), F.col(tiebreak_col).asc()
                )
            ),
        )
        .filter(F.col("__pr") <= shard_size)
        .drop("__pr")
    )
    w = Window.orderBy(F.col(score_col).desc(), F.col(tiebreak_col).asc())
    return (
        ordered.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shard_size)
        .drop("__r")
    )


def categorize_text(
    df: DataFrame,
    text_col: str,
    max_tokens: int = 4,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES categorize_text agg (the ML log-categorization bucketer),
    deterministic core: tokenize on whitespace, DROP tokens containing
    any digit (the "variable part" heuristic), lowercase, key each doc
    by its first ``max_tokens`` surviving tokens. Returns
    (category, doc_count, max_matching_length) — max_matching_length is
    ES's per-category longest original doc length."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: (t != "") & ~t.rlike("[0-9]"),
    )
    key = F.array_join(F.slice(toks, 1, max_tokens), " ")
    return (
        df.select(key.alias("category"), F.length(text_col).alias("__len"))
        .filter(F.col("category") != "")
        .groupBy("category")
        .agg(
            F.count("*").alias("doc_count"),
            F.max("__len").alias("max_matching_length"),
        )
        .filter(F.col("doc_count") >= min_doc_count)
    )


def trending_terms(
    df: DataFrame,
    ts_col: str,
    text_col: str,
    interval: str = "day",
    k: int = 5,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-time-bucket top-k terms — the date_histogram × terms
    composite every content dashboard runs. Tokenize map-side, ONE
    (bucket, term) aggregate shuffle, then a window over bucket
    partitions (each holds one row per distinct term — bucket-bounded,
    never row-bounded). Returns (bucket, term, tf, rank)."""
    stop = set(stopwords or [])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^\p{L}]+"),
        lambda t: t != "",
    )
    base = df.select(
        F.date_trunc(interval, F.col(ts_col)).alias("bucket"),
        F.explode(toks).alias("term"),
    )
    if stop:
        base = base.filter(~F.col("term").isin(*sorted(stop)))
    counts = base.groupBy("bucket", "term").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("bucket").orderBy(F.col("tf").desc(), F.col("term").asc())
    return counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def nested_terms_agg(
    df: DataFrame,
    nested_col: str,
    key_field: str,
    value_field: str,
    parent_id_col: str,
) -> DataFrame:
    """ES `nested` agg + `reverse_nested`: aggregate INSIDE an
    array-of-objects field (one bucket per nested key, counting nested
    docs), then step back out to the parent scope — ES's
    reverse_nested — counting distinct PARENT docs per bucket.

    One explode + one hash aggregate; count_distinct(parent) is the
    reverse_nested contract. Returns (key, nested_count, avg_value,
    parent_count)."""
    exploded = df.select(
        F.col(parent_id_col).alias("__parent"),
        F.explode(nested_col).alias("__n"),
    ).select(
        "__parent",
        F.col("__n").getField(key_field).alias("key"),
        F.col("__n").getField(value_field).alias("__v"),
    )
    return exploded.groupBy("key").agg(
        F.count("*").alias("nested_count"),
        F.avg("__v").alias("avg_value"),
        F.count_distinct("__parent").alias("parent_count"),
    )


def ip_prefix_agg(
    df: DataFrame,
    ip_col: str,
    prefix_length: int,
) -> DataFrame:
    """ES ip_prefix agg: bucket IPv4 addresses by their /n network
    prefix. Pure arithmetic on ip_to_long (mask = drop the 32-n host
    bits), rendered back to dotted-quad + '/n' keys. One aggregate."""
    v = ip_to_long(ip_col)
    net = F.shiftleft(F.shiftright(v, 32 - prefix_length), 32 - prefix_length)
    key = F.concat_ws(
        ".",
        F.shiftright(net, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(net, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(net, 8).bitwiseAND(F.lit(255)).cast("string"),
        net.bitwiseAND(F.lit(255)).cast("string"),
    )
    return (
        df.select(F.concat(key, F.lit(f"/{prefix_length}")).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("doc_count"))
    )


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_parent_key: str,
) -> DataFrame:
    """ES join-field ``has_parent`` query: children whose parent
    matches the (pre-filtered) ``parents`` relation, annotated with the
    parent key — the mirror of has_child. The qualifying-parents side
    reduces to its key column before the join (broadcast when small,
    shuffle equi-join otherwise); children never fan out."""
    pk = parents.select(F.col(parent_key).alias("__pk")).distinct()
    return children.join(
        pk, children[child_parent_key] == F.col("__pk")
    ).drop("__pk")


def terms_agg_sharded(
    toks: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
    size: int = 10,
    n_shards: int = 4,
    shard_size: int | None = None,
) -> DataFrame:
    """ES ``terms`` agg EXACTLY as it runs distributed, including its
    approximation accounting: each shard returns only its local top
    ``shard_size`` terms (ES default size*1.5+10), the coordinator sums
    per-term counts across shards, and every term carries
    ``doc_count_error_upper_bound`` — the worst-case undercount, i.e.
    the sum over non-reporting shards of the LAST (smallest) count that
    shard did return (the term could have hidden just below each cut).
    The global cut is the top ``size`` by merged count.

    Shards here are deterministic (``id_col % n_shards``), so the whole
    computation — including the error bounds — is engine-reproducible
    and SQL-oracle-checkable; on a real cluster the shard key is the
    routing hash. Plan: one (shard, term) hash agg, one per-shard
    rank window (shard-partitioned, never global), a small merge agg,
    and a grid anti-join for the bounds — each shard's survivor list is
    ``shard_size`` rows, so everything after the first agg is
    coordinator-sized, the exact ES topology."""
    if shard_size is None:
        shard_size = int(size * 1.5 + 10)
    sharded = toks.select(
        (F.col(id_col) % n_shards).alias("__shard"), F.col(term_col).alias("term")
    )
    counts = sharded.groupBy("__shard", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("__shard").orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    kept = counts.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= shard_size
    )
    # each shard's cut line: the smallest count it still reported
    cut = kept.groupBy("__shard").agg(F.min("cnt").alias("cut_cnt"))
    merged = kept.groupBy("term").agg(F.sum("cnt").alias("doc_count"))
    # worst-case undercount: shards where the term did NOT survive the cut
    grid = merged.select("term").crossJoin(cut)
    missing = grid.join(
        kept.select("term", "__shard"), ["term", "__shard"], "left_anti"
    )
    err = missing.groupBy("term").agg(
        F.sum("cut_cnt").alias("doc_count_error_upper_bound")
    )
    out = merged.join(err, "term", "left").select(
        "term",
        "doc_count",
        F.coalesce(
            F.col("doc_count_error_upper_bound"), F.lit(0)
        ).alias("doc_count_error_upper_bound"),
    )
    wk = Window.orderBy(F.col("doc_count").desc(), F.col("term").asc())
    return (
        out.withColumn("rank", F.row_number().over(wk).cast("long"))
        .filter(F.col("rank") <= size)
        .select("rank", "term", "doc_count", "doc_count_error_upper_bound")
    )


def moving_percentile(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    interval: str = "day",
    window: int = 3,
    p: float = 0.5,
    round_digits: int = 4,
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline agg, exact form: per calendar
    bucket, the ``p``-percentile of ALL raw values in the trailing
    ``window`` buckets (current included — the moving_percentiles
    window convention, unlike moving_fn's shift=0). ES merges t-digest
    sketches per window; this is the exact quantity those sketches
    approximate, computed with the discrete (type-1) definition
    ``sorted[floor((n-1)·p)]`` so an engine-independent oracle can
    replay it bit-for-bit (no interpolation ambiguity).

    Scale shape: raw values reduce to ONE array per calendar bucket in
    a hash agg; the ordered window runs over the bucket stream (one row
    per bucket), and the flatten + sort cost is bounded by
    window · bucket_size — at web scale pair it with a coarser rollup
    first if buckets hold 10^9 raw values (the t-digest trade ES makes;
    documented, not hidden)."""
    hist = events.groupBy(
        F.date_format(
            F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket")
    ).agg(F.collect_list(value_col).alias("__vals"))
    w = (
        Window.orderBy("bucket").rowsBetween(-(window - 1), 0)
    )
    arr = F.flatten(F.collect_list("__vals").over(w))
    sorted_arr = F.array_sort(arr)
    idx = F.floor((F.size(sorted_arr) - 1) * F.lit(float(p))).cast("int") + 1
    return (
        hist.select(
            "bucket",
            F.size(arr).alias("n_values"),
            F.round(F.element_at(sorted_arr, idx), round_digits).alias(
                "moving_pct"
            ),
        )
        .orderBy("bucket")
    )


def frequent_item_sets(
    baskets: DataFrame,
    min_support: int = 2,
    max_size: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    item_col: str = "item",
) -> DataFrame:
    """ES ``frequent_item_sets`` agg (Agrawal & Srikant's Apriori,
    VLDB 1994, level-wise): itemsets of size 1..``max_size`` occurring
    in >= ``min_support`` baskets. ``baskets``: one (id, item) row per
    distinct item per basket. Returns top-``k``
    (rank, items array<string>, size, support) by (support desc,
    items asc) — ES's doc_count ordering with a deterministic tie-break.

    Scale shape: level L candidates come from joining frequent L-1
    itemsets with frequent single items INSIDE each basket (classic
    anti-monotonicity: every subset of a frequent set is frequent), so
    the per-basket join fan-out is bounded by that basket's frequent
    items — never an unconditioned cross join. Each level is one
    basket-keyed equi-join + one hash aggregate; ``max_size`` bounds
    the number of shuffles. Head-item skew lands in map-side-combinable
    counts."""
    b = baskets.select(
        F.col(id_col).alias("bid"), F.col(item_col).alias("item")
    ).distinct()
    # L1
    sup1 = b.groupBy("item").agg(F.count("*").alias("support")).filter(
        F.col("support") >= min_support
    )
    fb = b.join(sup1.select("item"), "item")  # baskets restricted to L1
    out = sup1.select(
        F.array("item").alias("items"),
        F.lit(1).alias("size"),
        "support",
    )
    # itemsets as sorted arrays; grow by joining with a strictly
    # greater frequent item present in the same basket
    cur = fb.select("bid", F.array("item").alias("items"),
                    F.col("item").alias("last"))
    for size in range(2, max_size + 1):
        grown = (
            cur.join(
                fb.select(F.col("bid").alias("bid2"),
                          F.col("item").alias("nxt")),
                (F.col("bid") == F.col("bid2"))
                & (F.col("nxt") > F.col("last")),
            )
            .select(
                "bid",
                F.concat("items", F.array("nxt")).alias("items"),
                F.col("nxt").alias("last"),
            )
        )
        sup = grown.groupBy("items").agg(
            F.count("*").alias("support")
        ).filter(F.col("support") >= min_support)
        if not sup.take(1):
            break
        out = out.unionByName(
            sup.select("items", F.lit(size).alias("size"), "support")
        )
        cur = grown.join(sup.select("items"), "items")
    w = Window.orderBy(
        F.col("support").desc(), F.array_join("items", " ").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            F.array_join("items", " ").alias("items"),
            "size",
            "support",
        )
    )


def variable_width_histogram(
    df: DataFrame,
    value_col: str,
    buckets: int,
    round_digits: int = 4,
) -> DataFrame:
    """ES ``variable_width_histogram`` agg, deterministic variant: ES's
    implementation is a one-pass streaming clusterer whose bucket
    bounds are explicitly documented as approximate and input-order-
    dependent — unusable as a reproducible contract. This computes the
    clustering it approximates exactly: cut the sorted DISTINCT values
    at the (buckets-1) largest gaps (equivalently: single-linkage
    agglomerative clustering of 1-D points stopped at ``buckets``
    clusters, gap ties broken toward the earlier value). Documented
    deviation: deterministic bounds, same bucket shape (key = centroid,
    min, max, doc_count) and the same "natural gaps, not fixed
    interval" intent as the ES agg.

    Shape: the gap scan runs on the DISTINCT value relation — bounded
    by value cardinality, not row count (an unpartitioned window over
    distinct metric values; at 100 TB pre-bucket to a fixed grid first
    if the metric is continuous with unbounded cardinality). The final
    doc_count/centroid rollup is one range-join-free hash agg keyed by
    the assigned bucket. Returns (bucket, min_v, max_v, centroid,
    doc_count) ordered by min_v, with bucket 0..buckets-1."""
    vals = df.select(F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    ).distinct()
    w = Window.orderBy("v")
    gaps = vals.withColumn("gap", F.col("v") - F.lag("v").over(w))
    # rank gaps: largest first, ties to the earlier (smaller) value;
    # the top (buckets-1) gap positions start new clusters
    gw = Window.orderBy(F.col("gap").desc_nulls_last(), F.col("v").asc())
    starts = gaps.withColumn("gap_rank", F.row_number().over(gw)).withColumn(
        "is_cut",
        F.when(
            F.col("gap").isNotNull() & (F.col("gap_rank") <= buckets - 1), 1
        ).otherwise(0),
    )
    assigned = starts.withColumn(
        "bucket", F.sum("is_cut").over(Window.orderBy("v")).cast("long")
    ).select("v", "bucket")
    out = (
        df.select(F.col(value_col).alias("v"))
        .join(assigned, "v")
        .groupBy("bucket")
        .agg(
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.round(F.avg("v"), round_digits).alias("centroid"),
            F.count(F.lit(1)).alias("doc_count"),
        )
        .orderBy("min_v")
    )
    return out


def trimmed_mean(
    values: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    trim_frac: float = 0.1,
    order_tiebreak: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Symmetric trimmed mean per group (Tukey's robust location
    estimator — "Contributions to Probability and Statistics", 1960;
    the trim option ES exposes through its scripted metric recipes):
    drop the lowest and highest ``floor(trim_frac·n)`` values and
    average the rest, making the center immune to the heavy tails
    every web metric has.

    Exact rank semantics (mirrored in the oracle): rows ranked by
    (value, tiebreak) per group; keep rank in (lo, n - lo] with
    lo = floor(trim_frac·n).  Output: (group, n, n_trimmed, mean_all,
    trimmed_mean).  One rank window per group partition + two hash
    aggregates."""
    ranked = values.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.col(order_tiebreak).alias("tb"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(
                F.col("v").asc(), F.col("tb").asc()
            )
        ),
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    lo = F.floor(F.lit(float(trim_frac)) * F.col("n"))
    kept = ranked.withColumn(
        "keep", (F.col("rk") > lo) & (F.col("rk") <= F.col("n") - lo)
    )
    return kept.groupBy(F.col("grp").alias(group_col)).agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_trimmed"),
        F.round(F.avg("v"), round_digits).alias("mean_all"),
        F.round(
            F.sum(F.when(F.col("keep"), F.col("v"))) /
            F.sum(F.col("keep").cast("int")),
            round_digits,
        ).alias("trimmed_mean"),
    )


def association_rules(
    baskets: DataFrame,
    min_support: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    item_col: str = "item",
    round_digits: int = 6,
) -> DataFrame:
    """Association rules from frequent 2-itemsets — confidence, lift,
    leverage.

    Agrawal & Srikant (VLDB 1994) rule generation over the pair level
    of the Apriori lattice (``frequent_item_sets`` above builds the
    itemsets; this derives the directed rules a -> b):

        support(a->b)    = n_ab / N
        confidence(a->b) = n_ab / n_a
        lift(a->b)       = confidence / (n_b / N)
        leverage(a->b)   = n_ab/N - (n_a/N)(n_b/N)

    Top-``k`` rules by (lift desc, antecedent, consequent) among pairs
    with n_ab >= min_support.  Scale shape: one distinct projection,
    one self-join INSIDE the basket key (fan-out bounded by basket
    size), two hash aggregates — the same shape as the itemset miner.
    """
    b = baskets.select(
        F.col(id_col).alias("bid"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = b.select("bid").distinct().count()
    ones = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_i"))
    pairs = (
        b.alias("l")
        .join(b.alias("r"), "bid")
        .filter(F.col("l.item") != F.col("r.item"))
        .groupBy(
            F.col("l.item").alias("a"), F.col("r.item").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    nn = float(n_baskets)
    rules = (
        pairs.join(
            ones.select(F.col("item").alias("a"),
                        F.col("n_i").alias("n_a")),
            "a",
        )
        .join(
            ones.select(F.col("item").alias("b"),
                        F.col("n_i").alias("n_b")),
            "b",
        )
        .select(
            "a",
            "b",
            "n_ab",
            F.round(F.col("n_ab") / nn, round_digits).alias("support"),
            F.round(
                F.col("n_ab") / F.col("n_a"), round_digits
            ).alias("confidence"),
            (
                (F.col("n_ab") / F.col("n_a"))
                / (F.col("n_b") / nn)
            ).alias("lift_raw"),
            F.round(
                F.col("n_ab") / nn
                - (F.col("n_a") / nn) * (F.col("n_b") / nn),
                round_digits,
            ).alias("leverage"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        F.round("lift_raw", 9).desc(), F.col("a").asc(), F.col("b").asc()
    )
    return (
        rules.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank", "a", "b", "n_ab", "support", "confidence",
            F.round("lift_raw", round_digits).alias("lift"), "leverage",
        )
    )


def join_key_skew_audit(
    rows: DataFrame,
    key_cols,
    round_digits: int = 6,
) -> DataFrame:
    """Shuffle-key skew audit — which candidate keys need salting?

    The pre-flight check for every big join/groupBy at cluster scale
    (the AQE skew-join docs' own diagnosis, measured ahead of time):
    for each candidate key column, the per-key row counts' shape —
    top-1 key share, p99/median ratio, and the straggler-bound
    speedup ceiling n_rows/max_key (no schedule can beat the largest
    key's partition without salting).  A key with top_share ~ 1/keys
    hashes clean; top_share >> that marks the hot key a salted
    repartition (the index build's doc-shard salt,
    ``index/build.py``) exists to break.

    Per key column: (key, n_rows, n_keys, max_key_rows, top_share,
    p99_over_median, parallel_ceiling).
    """
    out = None
    for kc in key_cols:
        per = rows.groupBy(F.col(kc).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        row = per.agg(
            F.lit(kc).alias("key"),
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_key_rows"),
            F.round(
                F.max("c") / F.sum("c").cast("double"), round_digits
            ).alias("top_share"),
            F.round(
                F.percentile("c", F.lit(0.99))
                / F.percentile("c", F.lit(0.5)),
                round_digits,
            ).alias("p99_over_median"),
            F.round(
                F.sum("c") / F.max("c").cast("double"), round_digits
            ).alias("parallel_ceiling"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def welch_anova(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA — the k-group extension
    of the Welch t.

    Welch, "On the comparison of several mean values" (Biometrika
    1951): with per-group n_j, mean x_j, variance s_j^2 and weights
    w_j = n_j / s_j^2,

        F* = [sum w_j (x_j - x.)^2 / (k-1)]
             / [1 + 2(k-2)/(k^2-1) * sum (1 - w_j/W)^2 / (n_j - 1)]

    with x. = sum w_j x_j / W — valid under unequal variances, which
    plain ANOVA's pooled variance silently assumes away (the
    per-group value spreads here differ by construction).  The
    statistic and the Welch-Satterthwaite denominator df are
    reported; the 2-group special case reduces to ``t_test_welch``'s
    t^2.

    One row: (k_groups, f_stat, df1, df2, grand_weighted_mean).
    Sufficient-statistic sums only — one group rollup + one scalar
    pass.
    """
    per = events.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(value_col).alias("s"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("ss"),
    ).select(
        "g",
        "n",
        (F.col("s") / F.col("n")).alias("m"),
        (
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v"),
    )
    w = per.select(
        "g", "n", "m", "v", (F.col("n") / F.col("v")).alias("w")
    )
    tot = w.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("w").alias("bw"),
        F.sum(F.col("w") * F.col("m")).alias("wm"),
    ).collect()[0]
    k, big_w = float(tot.k), float(tot.bw)
    grand = float(tot.wm) / big_w
    parts = w.agg(
        F.sum(
            F.col("w")
            * (F.col("m") - F.lit(grand))
            * (F.col("m") - F.lit(grand))
        ).alias("num"),
        F.sum(
            (1.0 - F.col("w") / F.lit(big_w))
            * (1.0 - F.col("w") / F.lit(big_w))
            / (F.col("n") - 1)
        ).alias("lam"),
    ).collect()[0]
    num = float(parts.num) / (k - 1)
    lam = 3.0 * float(parts.lam) / (k * k - 1)
    f_stat = num / (1.0 + 2.0 * (k - 2) / 3.0 * lam)
    df2 = 1.0 / lam if lam > 0 else float("inf")
    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (
                int(k),
                round(f_stat, round_digits),
                int(k - 1),
                round(df2, round_digits),
                round(grand, round_digits),
            )
        ],
        "k_groups long, f_stat double, df1 long, df2 double, "
        "grand_weighted_mean double",
    )


def chi2_independence(
    events: DataFrame,
    dim_a: str = "event_type",
    dim_b_expr=None,
    round_digits: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    dimensions.

    Pearson (1900): over the contingency table of (A, B) with
    observed counts O_ij and expected E_ij = row_i * col_j / N,

        chi2 = sum (O - E)^2 / E,   df = (r - 1)(c - 1)

    — the workhorse "are these dimensions related" screen (here:
    does event type depend on ISO weekday — the hypothesis behind
    weekday-conditioned capacity plans).  The critical value at 0.05
    uses the same closed-form Wilson-Hilferty transform as the
    Ljung-Box gate (``ops/trend.py``) so no lookup table is needed.

    One row: (r_levels, c_levels, df, chi2, chi2_crit, significant).
    """
    if dim_b_expr is None:
        dim_b_expr = (
            (
                F.datediff(
                    F.to_date("ts"), F.lit("1970-01-01").cast("date")
                )
                + 3
            )
            % 7
            + 1
        ).cast("int")
    base = events.select(
        F.col(dim_a).alias("a"), dim_b_expr.alias("b")
    )
    obs = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    rows = obs.groupBy("a").agg(F.sum("o").alias("ra"))
    cols = obs.groupBy("b").agg(F.sum("o").alias("cb"))
    n = base.count()
    grid = (
        rows.crossJoin(cols)
        .join(obs, ["a", "b"], "left")
        .na.fill({"o": 0})
        .withColumn(
            "e",
            F.col("ra") * F.col("cb") / F.lit(float(n)),
        )
    )
    stat = grid.agg(
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
        F.sum(
            (F.col("o") - F.col("e"))
            * (F.col("o") - F.col("e"))
            / F.col("e")
        ).alias("chi2"),
    ).collect()[0]
    df = (stat.r - 1) * (stat.c - 1)
    h = float(df)
    crit = h * (
        1.0
        - 2.0 / (9.0 * h)
        + 1.6448536269514722 * (2.0 / (9.0 * h)) ** 0.5
    ) ** 3
    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (
                int(stat.r),
                int(stat.c),
                int(df),
                round(float(stat.chi2), round_digits),
                round(crit, round_digits),
                bool(stat.chi2 > crit),
            )
        ],
        "r_levels long, c_levels long, df long, chi2 double, "
        "chi2_crit double, significant boolean",
    )


def hist_quantile_audit(
    events: DataFrame,
    value_col: str = "value",
    n_buckets: int = 64,
    probs: tuple = (0.5, 0.9, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """Equi-width histogram quantile sketch vs exact quantiles — the
    accuracy price of one-pass mergeable summaries.

    The distributed-systems trade every metrics pipeline makes
    (Prometheus histograms, t-digest, DDSketch): a fixed-bucket
    histogram is mergeable across executors with no per-value state,
    but answers quantile queries only to bucket resolution.  The
    audit quantifies that: exact interpolated quantiles next to the
    upper-bucket-edge estimate the histogram would report, at the
    operative p50/p90/p99.  Error scales with (max-min)/n_buckets —
    the number this audit hands to capacity planning when choosing
    bucket counts.

    Per p: (p, exact_q, hist_q, abs_err, rel_err).
    """
    x = F.col(value_col).cast("double")
    st = events.agg(
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        F.count(x).alias("nv"),
    )
    mn, mx, nv = st.collect()[0]
    w = (mx - mn) / n_buckets
    b = F.least(
        F.floor((x - F.lit(mn)) / F.lit(w)).cast("long"),
        F.lit(n_buckets - 1),
    )
    hist = (
        events.groupBy(b.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wspec = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select("b", F.sum("c").over(wspec).alias("cum"))
    exact = events.agg(
        *[
            F.percentile(x, F.lit(p)).alias(f"e{i}")
            for i, p in enumerate(probs)
        ]
    ).collect()[0]
    spark = events.sparkSession
    parts = []
    for i, p in enumerate(probs):
        target = math.ceil(p * nv)
        bsel = (
            cum.filter(F.col("cum") >= target)
            .agg(F.min("b").alias("bs"))
        )
        parts.append(
            bsel.select(
                F.lit(float(p)).alias("p"),
                F.round(F.lit(float(exact[i])), round_digits).alias(
                    "exact_q"
                ),
                F.round(
                    F.lit(mn) + (F.col("bs") + 1) * F.lit(w),
                    round_digits,
                ).alias("hist_q"),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.select(
        "p",
        "exact_q",
        "hist_q",
        F.round(F.col("hist_q") - F.col("exact_q"), round_digits).alias(
            "abs_err"
        ),
        F.round(
            F.when(
                F.col("exact_q") != 0,
                (F.col("hist_q") - F.col("exact_q"))
                / F.col("exact_q"),
            ),
            round_digits,
        ).alias("rel_err"),
    )
