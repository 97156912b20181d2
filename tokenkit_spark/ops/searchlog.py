"""Search-log session analytics and privacy-release auditing.

* **Session success metrics**: per search session, query volume,
  click volume, reformulation count and abandonment — the
  log-analysis battery of Jansen & Spink ("How are we searching the
  World Wide Web?", IP&M 2006) and the abandonment framing of Li,
  Huffman & Tokuda ("Good abandonment in mobile and PC internet
  search", SIGIR 2009).  An abandoned session issued queries but never
  clicked — the primary dissatisfaction proxy when no relevance labels
  exist.

* **k-anonymity release audit**: before a query log leaves the
  pipeline, queries issued by fewer than k distinct users must be
  suppressed (the AOL-log lesson; Adar, "User 4XXXXX9: Anonymizing
  query logs", WWW 2007 workshop) — this audit reports exactly how
  much of the log survives a given k.

Scale shape: both are one or two hash aggregates keyed by session /
query string plus a window bounded by a session's own rows.  A
10^9-session log shards on session_id; the anonymity audit shards on
the query string.  No UDFs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_success(
    qlog: DataFrame,
    clicks: DataFrame,
    session_col: str = "session_id",
    order_col: str = "step",
    query_col: str = "query",
) -> DataFrame:
    """``qlog``: (session_id, step, query); ``clicks``: (session_id,
    step) — a click attributed to the query issued at that step.
    Returns one row per session: (session_id, n_queries, n_clicks,
    n_reformulations, abandoned) where a reformulation is a
    consecutive in-session pair of DIFFERENT query strings (the
    query-flow-graph edge definition, ops/queryflow.py)."""
    w = Window.partitionBy(session_col).orderBy(order_col)
    q = qlog.withColumn(
        "_ref",
        (
            F.lag(query_col).over(w).isNotNull()
            & (F.lag(query_col).over(w) != F.col(query_col))
        ).cast("int"),
    )
    per_q = q.groupBy(session_col).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("_ref").cast("long").alias("n_reformulations"),
    )
    per_c = clicks.groupBy(session_col).agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return (
        per_q.join(per_c, session_col, "left")
        .select(
            session_col,
            "n_queries",
            F.coalesce("n_clicks", F.lit(0)).cast("long").alias("n_clicks"),
            "n_reformulations",
            (F.coalesce("n_clicks", F.lit(0)) == 0).alias("abandoned"),
        )
    )


def k_anonymity_audit(
    qlog: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """One summary row: (k, n_rows, n_distinct_queries,
    n_suppressed_queries, n_suppressed_rows, frac_rows_released).
    A query is suppressed when fewer than ``k`` DISTINCT users issued
    it; all its log rows are withheld from the release."""
    per_query = qlog.groupBy(query_col).agg(
        F.countDistinct(user_col).alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_query.agg(
        F.lit(k).alias("k"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_queries"),
        F.sum((F.col("n_users") < k).cast("int"))
        .cast("long")
        .alias("n_suppressed_queries"),
        F.sum(F.when(F.col("n_users") < k, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_suppressed_rows"),
        F.round(
            1.0
            - F.sum(
                F.when(F.col("n_users") < k, F.col("n_rows")).otherwise(0)
            )
            / F.sum("n_rows"),
            round_digits,
        ).alias("frac_rows_released"),
    )


def l_diversity_audit(
    qlog: DataFrame,
    l: int = 2,
    k: int = 3,
    user_col: str = "user_id",
    quasi_col: str = "query",
    sensitive_col: str = "domain",
) -> DataFrame:
    """l-diversity audit of a k-anonymized query-log release
    (Machanavajjhala et al., "l-Diversity: Privacy Beyond
    k-Anonymity", ICDE 2006; the post-AOL-release lesson Adar 2007
    codifies): a group that passes k-anonymity (>= k distinct users)
    can still leak via the HOMOGENEITY attack when every row shares
    one sensitive value (here: the clicked domain) — distinct
    l-diversity additionally requires >= l distinct sensitive values
    per released group.

    One row per k-anonymous group: (quasi value, n_users, n_rows,
    n_sensitive, l_ok) — groups failing k-anonymity are already
    suppressed upstream and do not appear.  Two hash aggregates on the
    quasi-identifier key; nothing user-level leaves the executors."""
    per = qlog.groupBy(quasi_col).agg(
        F.countDistinct(user_col).alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
    )
    return per.filter(F.col("n_users") >= k).select(
        quasi_col,
        "n_users",
        "n_rows",
        "n_sensitive",
        (F.col("n_sensitive") >= l).alias("l_ok"),
    )


def t_closeness_audit(
    qlog: DataFrame,
    t: float = 0.3,
    k: int = 3,
    user_col: str = "user_id",
    quasi_col: str = "query",
    sensitive_col: str = "domain",
    order_col: str = "sens_order",
    round_digits: int = 6,
) -> DataFrame:
    """t-closeness audit of a k-anonymized release — the third rung of
    the privacy ladder after k-anonymity and l-diversity.

    Li, Li & Venkatasubramanian, "t-Closeness: privacy beyond
    k-anonymity and l-diversity" (ICDE 2007): an l-diverse group still
    leaks when its sensitive-value DISTRIBUTION differs sharply from
    the table's (the skewness/similarity attacks) — so require the
    Earth Mover's Distance between the group's distribution and the
    global one to be <= t.  For an ordered attribute with m values the
    paper's EMD has the closed form

        EMD = (1/(m-1)) * sum_{i=1..m-1} | sum_{j<=i} (p_j - q_j) |

    — the mean absolute cumulative-share gap, pure relational algebra
    (grid join + one ordered window), replayed exactly by the oracle.

    One row per k-anonymous group: (quasi value, n_rows, n_sensitive,
    emd, t_ok).  Scale shape: the value grid is |groups| x m rows with
    m tiny; the window is per-group ordered over m values.
    """
    released = (
        qlog.groupBy(quasi_col)
        .agg(
            F.countDistinct(user_col).alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .filter(F.col("n_users") >= k)
        .select(quasi_col, "n_rows")
    )
    vals = (
        qlog.groupBy(sensitive_col, order_col)
        .agg(F.count(F.lit(1)).alias("g_cnt"))
    )
    n_total = qlog.count()
    grid = released.crossJoin(
        F.broadcast(
            vals.select(
                sensitive_col,
                order_col,
                (F.col("g_cnt") / F.lit(float(n_total))).alias("q_share"),
            )
        )
    )
    per = qlog.groupBy(quasi_col, sensitive_col).agg(
        F.count(F.lit(1)).alias("p_cnt")
    )
    joined = (
        grid.join(per, [quasi_col, sensitive_col], "left")
        .na.fill({"p_cnt": 0})
        .withColumn(
            "p_share", F.col("p_cnt") / F.col("n_rows")
        )
    )
    w = (
        Window.partitionBy(quasi_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.withColumn(
        "cum_gap", F.sum(F.col("p_share") - F.col("q_share")).over(w)
    )
    m = vals.count()
    # the paper's sum runs i = 1..m-1; the i = m cumulative gap is 0
    # by construction, so summing all m terms is identical arithmetic
    emd = cum.groupBy(quasi_col, "n_rows").agg(
        (F.sum(F.abs(F.col("cum_gap"))) / F.lit(float(m - 1))).alias(
            "emd_raw"
        ),
        F.sum((F.col("p_cnt") > 0).cast("long")).alias("n_sensitive"),
    )
    return emd.select(
        quasi_col,
        "n_rows",
        "n_sensitive",
        F.round("emd_raw", round_digits).alias("emd"),
        (F.col("emd_raw") <= t).alias("t_ok"),
    )


NAV_SHARE_THRESHOLD = 0.8
ACTION_TERMS = ("download", "buy", "login", "signup", "order")


def query_intent(
    qlog: DataFrame,
    user_col: str = "user_id",
    query_col: str = "query",
    domain_col: str = "domain",
    round_digits: int = 6,
) -> DataFrame:
    """Query-intent taxonomy from click behavior — Broder's trichotomy
    operationalized on the log.

    Broder, "A taxonomy of web search" (SIGIR Forum 2002) with the
    click-based operationalization of Lee, Liu & Cho (WWW 2005):
    NAVIGATIONAL queries concentrate clicks on one destination (low
    click entropy / high top-domain share), INFORMATIONAL queries
    scatter them; TRANSACTIONAL intent is flagged lexically by the
    paper's action-verb cue list.  Per query:

        click_entropy = -sum_d p_d * ln p_d   over clicked domains,
        top_share     = max_d p_d,

    intent = 'transactional' if an action term occurs in the query,
    else 'navigational' if top_share >= 0.8, else 'informational'.

    Scale shape: one (query, domain) rollup, one query rollup; the
    classification is a projection.  Entropy over the rollup — never
    over raw rows.
    """
    per_qd = qlog.groupBy(query_col, domain_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    per_q = per_qd.groupBy(query_col).agg(
        F.sum("c").alias("n_clicks"),
        F.count(F.lit(1)).alias("n_domains"),
        F.max("c").alias("top_c"),
        F.sum(F.col("c") * F.log("c")).alias("clogc"),
    )
    ent = (
        F.log(F.col("n_clicks").cast("double"))
        - F.col("clogc") / F.col("n_clicks")
    )
    action_rx = "(^| )(" + "|".join(ACTION_TERMS) + ")( |$)"
    return per_q.select(
        query_col,
        "n_clicks",
        "n_domains",
        F.round(ent, round_digits).alias("click_entropy"),
        F.round(
            F.col("top_c") / F.col("n_clicks"), round_digits
        ).alias("top_share"),
        F.when(
            F.col(query_col).rlike(action_rx), F.lit("transactional")
        )
        .when(
            F.col("top_c") / F.col("n_clicks")
            >= NAV_SHARE_THRESHOLD,
            F.lit("navigational"),
        )
        .otherwise(F.lit("informational"))
        .alias("intent"),
    )


def reformulation_taxonomy(
    qlog: DataFrame,
    session_col: str = "session_id",
    step_col: str = "step",
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Classify consecutive in-session query transitions by term-set
    operations — the Jansen/Spink reformulation taxonomy.

    Jansen, Spink & Saracevic (IP&M 2000) / Rieh & Xie (IP&M 2006)
    move taxonomy, operationalized on term sets of adjacent queries
    within a session:

        repeat          same term set
        specialization  strict superset (terms added — narrowing)
        generalization  strict subset (terms dropped — broadening)
        reformulation   overlapping but neither contains the other
        new_intent      disjoint term sets (topic switch)

    Per class: transition counts and shares — the aggregate shape of
    how users steer the engine, the input the assistance features
    (suggestions ``queryflow``, spelling ``wordbreak``) are tuned
    against.  One lead window per session + set-algebra projections
    on split arrays; no joins beyond the rollup.
    """
    w = Window.partitionBy(session_col).orderBy(step_col)
    terms = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(query_col)), r"\s+"),
            lambda x: x != "",
        )
    )
    t = qlog.withColumn("cur", terms).withColumn(
        "nxt", F.lead("cur").over(w)
    ).filter(F.col("nxt").isNotNull())
    inter = F.size(F.array_intersect(F.col("cur"), F.col("nxt")))
    ncur = F.size("cur")
    nnxt = F.size("nxt")
    cls = (
        F.when((inter == ncur) & (inter == nnxt), "repeat")
        .when((inter == ncur) & (nnxt > ncur), "specialization")
        .when((inter == nnxt) & (ncur > nnxt), "generalization")
        .when(inter > 0, "reformulation")
        .otherwise("new_intent")
    )
    per = t.select(cls.alias("move"))
    tot = per.count()
    return (
        per.groupBy("move")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "move",
            "n",
            F.round(F.col("n") / F.lit(float(tot)), round_digits).alias(
                "share"
            ),
        )
    )


def dwell_satisfaction(
    qlog: DataFrame,
    sat_s: float = 30.0,
    quickback_s: float = 10.0,
    session_col: str = "session_id",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """SAT-click classification from dwell time — the implicit
    satisfaction signal.

    Fox et al., "Evaluating implicit measures to improve web search"
    (TOIS 2005): a click whose dwell (time to the user's next action)
    exceeds ~30s is a SAT click; a return within a few seconds is a
    QUICKBACK (negative signal); the LAST click of a session has
    unbounded dwell and is conventionally counted satisfied.  These
    labels are what click-model training and online metrics
    (``clicks.py``) consume as ground truth.

    Per session: (session_id, n_clicks, n_sat, n_quickback, n_last,
    sat_rate) with dwell from one lead window over the session's
    event times.
    """
    w = Window.partitionBy(session_col).orderBy(ts_col)
    t = qlog.withColumn(
        "dwell_s",
        (
            F.unix_timestamp(F.lead(ts_col).over(w))
            - F.unix_timestamp(F.col(ts_col))
        ).cast("double"),
    )
    lab = t.select(
        F.col(session_col).alias("session_id"),
        F.when(F.col("dwell_s").isNull(), "last")
        .when(F.col("dwell_s") >= sat_s, "sat")
        .when(F.col("dwell_s") < quickback_s, "quickback")
        .otherwise("mid")
        .alias("lab"),
    )
    return lab.groupBy("session_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum((F.col("lab") == "sat").cast("long")).alias("n_sat"),
        F.sum((F.col("lab") == "quickback").cast("long")).alias(
            "n_quickback"
        ),
        F.sum((F.col("lab") == "last").cast("long")).alias("n_last"),
        F.round(
            (
                F.sum((F.col("lab") == "sat").cast("long"))
                + F.sum((F.col("lab") == "last").cast("long"))
            )
            / F.count(F.lit(1)),
            round_digits,
        ).alias("sat_rate"),
    )


def log_release_pipeline(
    qlog: DataFrame,
    k: int = 3,
    min_term_users: int = 2,
    user_col: str = "user_id",
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Staged query-log release pipeline audit — how much survives
    each privacy gate.

    The post-AOL release recipe (Adar, "User 4xxxxx9: anonymizing
    query logs", WWW 2007 workshop; Cooper's survey, TWEB 2008)
    applied as a measured pipeline rather than a single filter:

        stage 1  k-anonymity: drop queries issued by < k distinct
                 users (``k_anonymity_audit``'s rule)
        stage 2  rare-term suppression: drop surviving queries
                 containing a term used by < min_term_users distinct
                 users across the log (vanity/ID terms that
                 re-identify even inside frequent queries)

    Per stage: (stage, stage_name, n_rows_kept, n_queries_kept,
    frac_rows_kept) with stage 0 = the raw log — the
    utility-vs-privacy curve release decisions actually weigh.
    """
    total_rows = qlog.count()
    per_q = qlog.groupBy(query_col).agg(
        F.countDistinct(user_col).alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    s1_q = per_q.filter(F.col("n_users") >= k).select(
        query_col, "n_rows"
    )
    terms = qlog.select(
        F.col(user_col).alias("u"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(query_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    rare_terms = (
        terms.groupBy("term")
        .agg(F.countDistinct("u").alias("tu"))
        .filter(F.col("tu") < min_term_users)
        .select("term")
    )
    q_terms = (
        qlog.select(query_col)
        .distinct()
        .select(
            query_col,
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(query_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("term"),
        )
    )
    tainted = (
        q_terms.join(rare_terms, "term")
        .select(query_col)
        .distinct()
    )
    s2_q = s1_q.join(tainted, query_col, "left_anti")
    spark = qlog.sparkSession

    def stage_row(stage, name, qdf):
        agg = qdf.agg(
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows_"),
            F.count(F.lit(1)).alias("qs"),
        ).collect()[0]
        return (
            stage,
            name,
            int(agg.rows_),
            int(agg.qs),
            round(agg.rows_ / total_rows, round_digits),
        )

    raw = per_q.select(query_col, "n_rows")
    data = [
        stage_row(0, "raw", raw),
        stage_row(1, "k_anonymity", s1_q),
        stage_row(2, "rare_term_suppression", s2_q),
    ]
    return spark.createDataFrame(
        data,
        "stage int, stage_name string, n_rows_kept long, "
        "n_queries_kept long, frac_rows_kept double",
    )


def query_cache_normalization_audit(
    qlog: DataFrame,
    stopwords=("the", "a", "of", "and"),
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Semantic query-cache normalization payoff — hit-rate gain from
    canonicalizing queries before the cache key.

    The results-cache key question (the companion knob to the cache
    SIZING audits in ``index/cache.py``): bag-of-words retrieval
    scores "hash join spark" and "spark hash join" identically, so a
    cache keyed on the RAW string misses reorderings, case variants
    and stopword noise.  Normalization = lowercase, drop stopwords,
    SORT terms.  For an infinite cache replaying the log, hit rate =
    1 - distinct_keys/requests; the audit reports it for raw vs
    normalized keys plus the collision count (distinct raw strings
    merged per normalized key).

    One row: (n_requests, raw_keys, norm_keys, raw_hit_rate,
    norm_hit_rate, merged_groups, max_group).
    """
    stop = [s for s in stopwords]
    norm = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(query_col)), r"\s+"),
                    lambda t: (t != "") & ~t.isin(stop),
                )
            )
        ),
        " ",
    )
    keyed = qlog.select(
        F.col(query_col).alias("raw"), norm.alias("nkey")
    )
    n_req = keyed.count()
    raw_keys = keyed.select("raw").distinct().count()
    norm_keys = keyed.select("nkey").distinct().count()
    groups = (
        keyed.select("raw", "nkey")
        .distinct()
        .groupBy("nkey")
        .agg(F.count(F.lit(1)).alias("g"))
    )
    gstats = groups.agg(
        F.sum((F.col("g") > 1).cast("long")).alias("merged"),
        F.max("g").alias("mx"),
    ).collect()[0]
    spark = qlog.sparkSession
    return spark.createDataFrame(
        [
            (
                n_req,
                raw_keys,
                norm_keys,
                round(1.0 - raw_keys / n_req, round_digits),
                round(1.0 - norm_keys / n_req, round_digits),
                int(gstats.merged or 0),
                int(gstats.mx or 0),
            )
        ],
        "n_requests long, raw_keys long, norm_keys long, "
        "raw_hit_rate double, norm_hit_rate double, "
        "merged_groups long, max_group long",
    )


def markov_order_eval(
    qlog: DataFrame,
    session_col: str = "session_id",
    step_col: str = "step",
    state_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Next-state prediction accuracy by Markov order 0/1/2 — how much
    history does the event stream actually carry?

    The model-order selection exercise of sequence analytics
    (Chierichetti, Kumar, Raghavan & Sarlos, "Are web users really
    Markovian?", WWW 2012 ask exactly this): predict each transition's
    next state with the mode of (a) the global state distribution
    (order 0), (b) the successors of the current state (order 1),
    (c) the successors of the last TWO states (order 2) — all counts
    from the full log (in-sample, the determinism-preserving harness;
    ties by state string).  Accuracy lift from 0 -> 1 -> 2 measures
    usable sequential structure; a flat curve says the stream is
    i.i.d. and per-state personalization is wasted.

    One row per order: (markov_order, n_eval, n_contexts, accuracy).
    Shape: lead windows per session + mode-per-context rank windows —
    count tables, never sequence collection.
    """
    w = Window.partitionBy(session_col).orderBy(step_col)
    t = (
        qlog.withColumn("s0", F.col(state_col))
        .withColumn("s1", F.lag(state_col, 1).over(w))
        .withColumn("s2", F.lag(state_col, 2).over(w))
        .withColumn("nxt", F.lead(state_col).over(w))
        .filter(F.col("nxt").isNotNull())
    )
    spark = qlog.sparkSession

    def mode_of(ctx_cols):
        cnt = t.groupBy(*ctx_cols, "nxt").agg(
            F.count(F.lit(1)).alias("c")
        )
        wr = Window.partitionBy(*ctx_cols).orderBy(
            F.col("c").desc(), F.col("nxt").asc()
        )
        return (
            cnt.withColumn("r", F.row_number().over(wr))
            .filter(F.col("r") == 1)
            .select(*ctx_cols, F.col("nxt").alias("pred"))
        )

    out = None
    for order, ctx in ((0, []), (1, ["s0"]), (2, ["s1", "s0"])):
        if order == 2:
            evalset = t.filter(F.col("s1").isNotNull())
        else:
            evalset = t
        if ctx:
            pred = mode_of(ctx)
            joined = evalset.join(pred, ctx)
        else:
            g = t.groupBy("nxt").agg(F.count(F.lit(1)).alias("c"))
            top = (
                g.orderBy(F.col("c").desc(), F.col("nxt").asc())
                .limit(1)
                .select(F.col("nxt").alias("pred"))
            )
            joined = evalset.crossJoin(F.broadcast(top))
        n_ctx = (
            t.select(*ctx).distinct().count() if ctx else 1
        )
        acc = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("nxt") == F.col("pred")).cast("long")
            ).alias("ok"),
        ).collect()[0]
        row = spark.createDataFrame(
            [
                (
                    order,
                    int(acc.n),
                    n_ctx,
                    round(acc.ok / acc.n, round_digits)
                    if acc.n
                    else 0.0,
                )
            ],
            "markov_order int, n_eval long, n_contexts long, "
            "accuracy double",
        )
        out = row if out is None else out.unionByName(row)
    return out


HEAD_KS = (1, 10, 100)


def query_head_coverage(
    qlog: DataFrame,
    query_col: str = "query",
    round_digits: int = 6,
) -> DataFrame:
    """Query-traffic head coverage — what share of volume the top
    distinct queries carry.

    The curve behind every results-cache and curation decision
    (Silverstein et al., "Analysis of a very large web search engine
    query log", SIGIR Forum 1999 measured it first): the cumulative
    volume share of the top-1 / top-10 / top-100 distinct queries.
    A steep head funds caches and editorial answers; a flat head says
    invest in the tail (synonyms, spelling).

    Per k: (k, n_distinct, covered_requests, coverage).
    """
    from pyspark.sql import Window

    freq = qlog.groupBy(F.col(query_col).alias("q")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = freq.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("d")
    ).collect()[0]
    w = Window.orderBy(F.col("c").desc(), F.col("q").asc())
    ranked = freq.withColumn("r", F.row_number().over(w))
    out = None
    for k in HEAD_KS:
        row = ranked.filter(F.col("r") <= k).agg(
            F.lit(k).alias("k"),
            F.lit(int(tot.d)).alias("n_distinct"),
            F.sum("c").alias("covered_requests"),
            F.round(
                F.sum("c") / F.lit(float(tot.n)), round_digits
            ).alias("coverage"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def log_templates(
    logs: DataFrame,
    msg_col: str = "message",
    round_digits: int = 6,
) -> DataFrame:
    """Drain-lite log templating — collapse raw messages into
    parameterized templates.

    He, Zhu, Zheng & Lyu, "Drain: an online log parsing approach with
    fixed depth tree" (ICWS 2017), reduced to its deterministic batch
    core: messages cluster by (token count, first token) — Drain's
    top tree levels — and within a cluster each token position is
    either CONSTANT (one distinct value) or a parameter slot,
    rendered ``<*>``.  The template table is what log analytics
    pipelines aggregate on instead of raw strings (counts per
    template, novel-template alerting).

    Per cluster: (n_tokens, first_token, template, n_messages,
    n_param_slots).  Shape: one posexplode, a per-(cluster, position)
    distinct-count rollup, and an ordered re-assembly via
    array_agg — no trees, no state.
    """
    toks = logs.select(
        F.col(msg_col).alias("msg"),
        F.filter(
            F.split(F.col(msg_col), r"\s+"), lambda x: x != ""
        ).alias("ts"),
    ).withColumn("n_tokens", F.size("ts")).withColumn(
        "first_token", F.element_at("ts", 1)
    )
    pos = toks.select(
        "n_tokens",
        "first_token",
        "msg",
        F.posexplode("ts").alias("p", "tok"),
    )
    per_pos = pos.groupBy("n_tokens", "first_token", "p").agg(
        F.countDistinct("tok").alias("nv"),
        F.min("tok").alias("only"),
    )
    slots = per_pos.select(
        "n_tokens",
        "first_token",
        "p",
        F.when(F.col("nv") == 1, F.col("only"))
        .otherwise(F.lit("<*>"))
        .alias("piece"),
    )
    tmpl = (
        slots.groupBy("n_tokens", "first_token")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("p", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
                " ",
            ).alias("template"),
            F.sum(
                (F.col("piece") == "<*>").cast("long")
            ).alias("n_param_slots"),
        )
    )
    counts = toks.groupBy("n_tokens", "first_token").agg(
        F.count(F.lit(1)).alias("n_messages")
    )
    return tmpl.join(counts, ["n_tokens", "first_token"]).select(
        "n_tokens", "first_token", "template", "n_messages",
        "n_param_slots",
    )
