"""Static search-results cache sizing audit.

Baeza-Yates, Gionis, Junqueira, Murdock, Plachouras & Silvestri, "The
impact of caching on search engines" (SIGIR 2007): query streams are
so skewed that a small static cache of the most frequent queries'
RESULT PAGES absorbs a large share of traffic — and for a static
cache, filling by past query frequency is the optimal policy. The
broker answers hits without touching the index at all, so the saved
cost is each hit's full posting-traversal volume.

``static_cache_audit`` sweeps a ladder of cache sizes over a query
log and reports, per size: volume hit rate, the compulsory-miss
ceiling (distinct/volume — what even an infinite cache cannot beat),
and the fraction of posting-row traffic the cache absorbs (hits
weighted by each query's posting-list volume). That triple is the
capacity-planning curve from the paper, computed exactly.

Scale shape: one groupBy over the log (frequency table), one window
to rank queries by frequency (deterministic ties: freq desc, query
asc), a tiny per-term posting-volume aggregate joined to the query
relation, then the ladder is a range join of the ranked-query
relation against the literal size list — log-linear, no UDFs, no
driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def static_cache_audit(
    log: DataFrame,
    docs: DataFrame,
    sizes: list[int] = (1, 2, 4, 8, 16, 32, 64),
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """``log``: (qtext) one row per issued query. Returns per cache
    size: (cache_size, volume, hits, hit_rate, compulsory_miss_rate,
    rows_saved_frac) where the cache holds the ``cache_size`` most
    frequent distinct queries (freq desc, qtext asc)."""
    freq = log.groupBy("qtext").agg(F.count(F.lit(1)).alias("freq"))
    wq = Window.orderBy(F.col("freq").desc(), F.col("qtext").asc())
    ranked = freq.withColumn("qr", F.row_number().over(wq))

    # posting-row volume per query: sum over its distinct terms of the
    # term's corpus occurrence count (what the evaluator would scan)
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term")
    )
    tvol = toks.groupBy("term").agg(F.count(F.lit(1)).alias("rows"))
    qterms = freq.select(
        "qtext",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("qtext")), r"\s+"),
                    lambda x: x != "",
                )
            )
        ).alias("term"),
    )
    qvol = (
        qterms.join(tvol, "term", "left")
        .groupBy("qtext")
        .agg(F.sum(F.coalesce(F.col("rows"), F.lit(0))).alias("qrows"))
    )
    per_q = ranked.join(qvol, "qtext")

    totals = per_q.agg(
        F.sum("freq").alias("volume"),
        F.count(F.lit(1)).alias("distinct_q"),
        F.sum(F.col("freq") * F.col("qrows")).alias("total_rows"),
    )
    ladder = per_q.sparkSession.createDataFrame(
        [(int(s),) for s in sizes], "cache_size long"
    )
    hits = (
        ladder.join(per_q, per_q["qr"] <= ladder["cache_size"])
        .groupBy("cache_size")
        .agg(
            F.sum("freq").alias("hits"),
            F.sum(F.col("freq") * F.col("qrows")).alias("rows_saved"),
        )
    )
    return (
        ladder.join(hits, "cache_size", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "cache_size",
            "volume",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.col("volume"), round_digits
            ).alias("hit_rate"),
            F.round(
                (F.col("volume") - F.col("distinct_q")) / F.col("volume"),
                round_digits,
            ).alias("max_hit_rate"),
            F.round(
                F.coalesce("rows_saved", F.lit(0)) / F.col("total_rows"),
                round_digits,
            ).alias("rows_saved_frac"),
        )
        .orderBy("cache_size")
    )


def posting_cache_audit(
    log: DataFrame,
    docs: DataFrame,
    budgets: list[int] = (100, 500, 1000, 5000, 10000, 50000),
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Static POSTING-LIST cache sizing — the index-server tier below
    the results cache (Baeza-Yates et al., SIGIR 2007 §5: the QtfDf
    policy). Fill a fixed budget of posting rows with the terms that
    maximize query-hits per cached row: rank terms by qtf/df (query-log
    frequency over posting-list length; ties qtf desc, term asc), take
    the longest prefix whose cumulative posting rows fit the budget.

    ``log``: (qtext) one row per issued query. Returns per budget:
    (budget_rows, n_terms_cached, rows_cached, term_hit_rate,
    traffic_saved_frac) where term_hit_rate is the fraction of in-vocab
    query-term occurrences served from cache and traffic_saved_frac the
    fraction of posting-row traffic (Σ qtf·df) absorbed. OOV query
    terms have no posting list to cache or fetch and are excluded from
    both ratios.

    Scale shape: the log aggregates to a term-frequency relation, the
    corpus to a df relation (the same one the index build computes);
    one window gives the cumulative-rows prefix; the ladder is a range
    join against the literal budget list. No UDFs, no driver loops.
    """
    qtf = (
        log.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("qtext")), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    dft = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    terms = qtf.join(dft, "term")  # inner: OOV terms uncacheable
    w = Window.orderBy(
        (F.col("qtf") / F.col("df")).desc(),
        F.col("qtf").desc(),
        F.col("term").asc(),
    )
    ranked = terms.withColumn(
        "cum_rows",
        F.sum("df").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    totals = terms.agg(
        F.sum("qtf").alias("total_qtf"),
        F.sum(F.col("qtf") * F.col("df")).alias("total_traffic"),
    )
    ladder = log.sparkSession.createDataFrame(
        [(int(b),) for b in budgets], "budget_rows long"
    )
    picked = (
        ladder.join(ranked, ranked["cum_rows"] <= ladder["budget_rows"])
        .groupBy("budget_rows")
        .agg(
            F.count(F.lit(1)).alias("n_terms_cached"),
            F.max("cum_rows").alias("rows_cached"),
            F.sum("qtf").alias("qtf_hit"),
            F.sum(F.col("qtf") * F.col("df")).alias("traffic_hit"),
        )
    )
    return (
        ladder.join(picked, "budget_rows", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "budget_rows",
            F.coalesce("n_terms_cached", F.lit(0)).alias("n_terms_cached"),
            F.coalesce("rows_cached", F.lit(0)).alias("rows_cached"),
            F.round(
                F.coalesce("qtf_hit", F.lit(0)) / F.col("total_qtf"),
                round_digits,
            ).alias("term_hit_rate"),
            F.round(
                F.coalesce("traffic_hit", F.lit(0)) / F.col("total_traffic"),
                round_digits,
            ).alias("traffic_saved_frac"),
        )
        .orderBy("budget_rows")
    )


def lru_stack_audit(
    docs: DataFrame,
    sizes: tuple[int, ...] = (8, 64, 512),
    window: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """LRU posting-list-cache hit-rate curve via stack (reuse)
    distances — Mattson, Gecsei, Slutz & Traiger, "Evaluation
    techniques for storage hierarchies" (IBM Systems Journal 9(2),
    1970): one pass over an access trace yields the hit rate of EVERY
    LRU cache size at once, because an access hits a cache of
    capacity C iff its stack distance (1 + number of DISTINCT other
    items referenced since the previous access to the same item)
    is <= C. This is the dynamic-policy complement to the static
    QtfDf audits above (Baeza-Yates et al. SIGIR 2007 compare exactly
    these two curves).

    The trace here is the posting-list request stream a scorer
    issues: the corpus term stream in (doc, position) order.

    Relational formulation: for consecutive occurrences (p, i) of a
    term, the distinct count in the open interval is the number of
    accesses j with p < seq_j < i whose OWN previous occurrence is
    <= p (each distinct term in the window is counted exactly once,
    at its first in-window occurrence). That turns the stack distance
    into a band join of gaps against accesses.

    Resolution bound: gaps whose RAW length exceeds ``window`` are
    classified unresolved and counted as misses at every size (their
    distinct count may still be small, but bounding the band is what
    keeps the join linear — the standard windowed-trace trade-off;
    sizes <= window are exact-or-conservative, and any size <= the
    typical trace working set is unaffected in practice). The band
    join buckets accesses by seq div window so Spark executes an
    equi-join with <= 3 bucket rows per gap, never a nested loop.

    Note the trace sequence itself is a single global ordering (one
    row_number over (doc, pos)) — trace analysis is inherently
    sequential; run it per shard or on a sampled trace at corpus
    scale.

    Returns one row per size: (cache_size, n_accesses, first_refs,
    unresolved, hits, hit_rate), hit_rate = hits / n_accesses
    (first references are compulsory misses, per the paper).
    """
    toks = docs.select(
        id_col,
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("pos", "term"),
    )
    seq_w = Window.orderBy(F.col(id_col).asc(), F.col("pos").asc())
    acc = toks.withColumn("seq", F.row_number().over(seq_w)).select(
        "seq", "term"
    )
    prev_w = Window.partitionBy("term").orderBy("seq")
    acc = acc.withColumn("prev", F.lag("seq").over(prev_w)).localCheckpoint()

    gaps = acc.filter(F.col("prev").isNotNull()).select(
        F.col("prev").alias("p"), F.col("seq").alias("i")
    )
    resolved = gaps.filter(F.col("i") - F.col("p") - 1 <= window)
    unresolved_cnt = gaps.count() - resolved.count()
    first_refs = acc.filter(F.col("prev").isNull()).count()
    n_accesses = acc.count()

    g_b = resolved.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("p") / window), F.floor(F.col("i") / window)
            )
        ),
    )
    j_b = acc.withColumn("bucket", F.floor(F.col("seq") / window))
    between = (
        g_b.join(j_b, "bucket")
        .filter(
            (F.col("seq") > F.col("p"))
            & (F.col("seq") < F.col("i"))
            & (F.col("prev").isNull() | (F.col("prev") <= F.col("p")))
        )
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("between_cnt"))
    )
    dist = (
        resolved.join(between, "i", "left")
        .select(
            (F.coalesce(F.col("between_cnt"), F.lit(0)) + 1).alias("sdist")
        )
    )
    sizes_df = dist.sparkSession.createDataFrame(
        [(int(s),) for s in sizes], "cache_size long"
    )
    ladder = dist.crossJoin(F.broadcast(sizes_df))
    # left-join back onto the size ladder so a trace with zero resolved
    # gaps still reports hits = 0 at every size
    hits = sizes_df.join(
        ladder.groupBy("cache_size").agg(
            F.sum(
                (F.col("sdist") <= F.col("cache_size")).cast("long")
            ).alias("h")
        ),
        "cache_size",
        "left",
    ).select("cache_size", F.coalesce("h", F.lit(0)).alias("hits"))
    return hits.select(
        "cache_size",
        F.lit(int(n_accesses)).alias("n_accesses"),
        F.lit(int(first_refs)).alias("first_refs"),
        F.lit(int(unresolved_cnt)).alias("unresolved"),
        "hits",
        F.round(F.col("hits") / float(n_accesses), round_digits).alias(
            "hit_rate"
        ),
    ).orderBy("cache_size")


CHE_NEWTON_ITERS = 8


def che_lru_approximation(
    qlog: DataFrame,
    cache_sizes=(8, 32, 128),
    key_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Che's approximation of LRU hit ratio under IRM — the closed-form
    cache model, checked per size.

    Che, Tung & Wang, "Hierarchical web caching systems" (JSAC 2002),
    with Fricker/Robert/Roberts (ITC 2012) explaining WHY it is so
    accurate: under the independent reference model with per-key
    request probabilities p_i, an LRU of size C behaves like TTL
    caches sharing one CHARACTERISTIC TIME T solving

        sum_i (1 - e^(-p_i T)) = C,

    and key i's hit ratio is 1 - e^(-p_i T); the overall hit ratio is
    the request-weighted mean.  T is found by ``CHE_NEWTON_ITERS``
    Newton steps from T_0 = C (deterministic fixed iteration count —
    the same both-engines-replayable policy as the incomplete-gamma
    deviation in ``index/taily.py``); p_i comes from the log's key
    frequencies.  The exact-replay counterpart (real dependence, no
    IRM) lives in ``lru_cache_audit`` — the gap between them is the
    model error the ITC paper bounds.

    Per cache size: (cache_size, t_char, predicted_hit_ratio,
    max_hit_ratio) with the last = 1 - distinct/requests — the
    infinite-cache hit ceiling no LRU can beat (every distinct key
    must miss once).
    """
    freq = qlog.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = freq.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("d")
    ).collect()[0]
    n_req, n_keys = float(tot.n), int(tot.d)
    probs = freq.select((F.col("c") / F.lit(n_req)).alias("p"))
    spark = qlog.sparkSession
    rows = []
    for c_size in cache_sizes:
        c_eff = float(min(c_size, n_keys - 1))
        t = float(c_size)
        for _ in range(CHE_NEWTON_ITERS):
            r = probs.agg(
                F.sum(
                    1.0 - F.exp(-F.col("p") * F.lit(t))
                ).alias("f"),
                F.sum(
                    F.col("p") * F.exp(-F.col("p") * F.lit(t))
                ).alias("fp"),
            ).collect()[0]
            if r.fp and r.fp > 0:
                t = t - (r.f - c_eff) / r.fp
            if t < 0:
                t = 0.0
        hit = probs.agg(
            F.sum(
                F.col("p") * (1.0 - F.exp(-F.col("p") * F.lit(t)))
            ).alias("h")
        ).collect()[0].h
        rows.append(
            (
                int(c_size),
                round(t, round_digits),
                round(float(hit), round_digits),
                round(1.0 - n_keys / n_req, round_digits),
            )
        )
    return spark.createDataFrame(
        rows,
        "cache_size long, t_char double, predicted_hit_ratio double, "
        "max_hit_ratio double",
    )


def negative_cache_audit(
    docs: DataFrame,
    qlog: DataFrame,
    text_col: str = "text",
    key_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Negative-result cache payoff — how much traffic asks questions
    with no answer, repeatedly.

    The miss-caching counterpart of the results-cache audits above
    (the pattern RFC 2308 standardizes for DNS NXDOMAIN, equally load-
    bearing for search backends): a query NONE of whose terms exist
    in the vocabulary can be answered from a tiny negative cache
    without touching a single posting.  The audit classifies the
    log's queries (zero-result = no term matches the vocabulary),
    then measures repeat traffic on them — the fraction of total
    requests a negative cache absorbs.

    One row: (n_requests, n_zero_requests, n_zero_distinct,
    zero_traffic_frac, neg_cache_hit_frac) where the last counts
    zero-result REPEATS (first occurrence must miss).
    """
    vocab = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("term")
        )
        .distinct()
    )
    q = qlog.select(F.col(key_col).alias("raw"))
    qt = q.distinct().select(
        "raw",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("raw")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    has_hit = (
        qt.join(vocab, "term", "left_semi")
        .select("raw")
        .distinct()
    )
    zero_q = q.select("raw").distinct().join(
        has_hit, "raw", "left_anti"
    )
    n_requests = q.count()
    zero_traffic = q.join(zero_q, "raw", "left_semi")
    n_zero_req = zero_traffic.count()
    n_zero_distinct = zero_q.count()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_requests,
                n_zero_req,
                n_zero_distinct,
                round(n_zero_req / n_requests, round_digits)
                if n_requests
                else 0.0,
                round(
                    (n_zero_req - n_zero_distinct) / n_requests,
                    round_digits,
                )
                if n_requests
                else 0.0,
            )
        ],
        "n_requests long, n_zero_requests long, n_zero_distinct long, "
        "zero_traffic_frac double, neg_cache_hit_frac double",
    )
