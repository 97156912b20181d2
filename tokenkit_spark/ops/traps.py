"""Crawl-trap detection signals — the per-host URL-shape heuristics
production crawlers use to avoid infinite URL spaces (Heydon & Najork,
"Mercator: A scalable, extensible Web crawler", WWW 1999 §3.4 discuss
traps; Heritrix ships the same family as PathologicalPathDecideRule /
TooManyPathSegmentsDecideRule / parameter caps).

Calendar pages, session-id echoes and self-linking CGI scripts
generate unbounded URL sets that are individually valid, so traps are
detected from aggregate URL shape per host, not per page:

* very deep paths (segment count past a sane limit),
* repeated path segments (``/a/b/a/b/a`` — the pathological-path rule),
* heavy query-parameter use (session ids, sort orders, calendars).

Scale shape: pure Catalyst string/array expressions per URL (split +
array_distinct, whole-stage codegen) and ONE host-keyed hash
aggregate; a 10^11-URL frontier shards on host and never touches a
UDF or the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_shape(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds per-URL shape columns: depth (path segments), has_repeat
    (some path segment occurs twice), n_params (query parameters)."""
    path_q = F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    path = F.element_at(F.split(path_q, r"\?", 2), 1)
    query = F.when(
        F.size(F.split(path_q, r"\?", 2)) > 1,
        F.element_at(F.split(path_q, r"\?", 2), 2),
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return urls.withColumns(
        {
            "depth": F.size(segs),
            "has_repeat": F.size(segs) != F.size(F.array_distinct(segs)),
            "n_params": F.when(query.isNull() | (query == ""), 0).otherwise(
                F.size(F.split(query, "&"))
            ),
        }
    )


def trap_signals(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    depth_limit: int = 6,
    repeat_frac: float = 0.3,
    round_digits: int = 6,
) -> DataFrame:
    """One row per host: (host, n_urls, max_depth, frac_repeat,
    avg_params, trap_suspect).  ``trap_suspect`` fires when the host's
    deepest path exceeds ``depth_limit`` or more than ``repeat_frac``
    of its URLs repeat a path segment — the two Mercator/Heritrix
    kill rules this audit feeds."""
    shaped = url_shape(urls, url_col)
    return (
        shaped.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.max("depth").alias("max_depth"),
            F.round(
                F.avg(F.col("has_repeat").cast("int")), round_digits
            ).alias("frac_repeat"),
            F.round(F.avg("n_params"), round_digits).alias("avg_params"),
        )
        .withColumn(
            "trap_suspect",
            (F.col("max_depth") > depth_limit)
            | (F.col("frac_repeat") > repeat_frac),
        )
    )


PAGE_PARAM_RX = r"([?&])(page|p|start|offset)=(\d+)"
PAGE_PATH_RX = r"/page/(\d+)/?$"


def pagination_families(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    round_digits: int = 6,
) -> DataFrame:
    """Pagination-family rollup — how much of a host's URL space is
    page-N variants of the same listing.

    The crawl-scheduling counterpart of the trap signals above: deep
    pagination chains (?page=N, /page/N/) are the benign-looking half
    of the "infinite crawl space" problem (Mercator §3.4) — each page
    is fetchable and unique, but value decays fast with N, so
    frontiers cap family depth rather than URL count.  A URL's FAMILY
    key is the URL with its pagination marker stripped (query param
    ``page|p|start|offset`` removed; trailing ``/page/N`` dropped);
    the page NUMBER is the marker's integer (1 when absent).

    Per host: (host, n_urls, n_paginated, n_families, max_family_size,
    max_page_no, frac_paginated).  Pure regexp projections + two hash
    aggregates.
    """
    u = F.col(url_col)
    has_q = u.rlike(PAGE_PARAM_RX)
    has_p = u.rlike(PAGE_PATH_RX)
    family = F.regexp_replace(
        F.regexp_replace(u, PAGE_PARAM_RX, "$1"), PAGE_PATH_RX, "/"
    )
    page_no = (
        F.when(has_q, F.regexp_extract(u, PAGE_PARAM_RX, 3))
        .when(has_p, F.regexp_extract(u, PAGE_PATH_RX, 1))
        .otherwise(F.lit("1"))
        .cast("long")
    )
    per = pages.select(
        F.col(host_col).alias("host"),
        family.alias("family"),
        (has_q | has_p).cast("long").alias("pg"),
        page_no.alias("page_no"),
    )
    fam = per.groupBy("host", "family").agg(
        F.count(F.lit(1)).alias("fam_size"),
        F.max("page_no").alias("fam_max_page"),
    )
    a = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("pg").alias("n_paginated"),
        F.round(F.sum("pg") / F.count(F.lit(1)), round_digits).alias(
            "frac_paginated"
        ),
    )
    b = fam.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_families"),
        F.max("fam_size").alias("max_family_size"),
        F.max("fam_max_page").alias("max_page_no"),
    )
    return a.join(b, "host").select(
        "host", "n_urls", "n_paginated", "n_families",
        "max_family_size", "max_page_no", "frac_paginated",
    )


BOT_RATE_PER_MIN = 20.0
BOT_CV_MAX = 0.3
BOT_NIGHT_SHARE = 0.6


def bot_detection(
    events,
    ts_col: str = "ts",
    user_col: str = "user_id",
    round_digits: int = 6,
):
    """Heuristic bot scoring of access-log actors — rate, regularity,
    circadian signals.

    The classic log-hygiene triad (Tan & Kumar, "Discovery of web
    robot sessions based on their navigational patterns", DMKD 2002;
    the features every analytics pipeline screens on before counting
    'users'): per actor,

        peak_rate      max events per minute (machines burst)
        gap_cv         coefficient of variation of inter-event gaps
                       (machines are REGULAR: cv << 1; humans ~ 1)
        night_share    fraction of events in 00:00-05:59 UTC
                       (humans sleep)

    Flags: high_rate (peak >= 20/min), metronomic (cv <= 0.3 with
    >= 10 events), nocturnal (night share >= 0.6); ``bot_score`` is
    the flag count.  One row per user: (user_id, n_events, peak_rate,
    gap_cv, night_share, high_rate, metronomic, nocturnal,
    bot_score).  All window/rollup relational — per-user work keyed
    by the user shuffle.
    """
    from pyspark.sql import DataFrame, Window

    sec = F.unix_timestamp(F.col(ts_col))
    minute = F.floor(sec / 60).cast("long")
    per_min = events.groupBy(
        F.col(user_col).alias("u"), minute.alias("m")
    ).agg(F.count(F.lit(1)).alias("c"))
    peak = per_min.groupBy("u").agg(F.max("c").alias("peak_rate"))
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gaps = (
        events.withColumn(
            "gap",
            (sec - F.unix_timestamp(F.lag(ts_col).over(w)))
            .cast("double"),
        )
        .filter(F.col("gap").isNotNull())
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("ng"),
            F.sum("gap").alias("s"),
            F.sum(F.col("gap") * F.col("gap")).alias("ss"),
        )
    )
    mu = F.col("s") / F.col("ng")
    sig = F.sqrt(
        F.greatest(
            (F.col("ss") - F.col("s") * F.col("s") / F.col("ng"))
            / F.col("ng"),
            F.lit(0.0),
        )
    )
    cv = F.when(mu > 0, sig / mu)
    night = events.groupBy(F.col(user_col).alias("u")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.hour(ts_col) < 6).cast("long")
        ).alias("n_night"),
    )
    j = (
        night.join(peak, "u")
        .join(gaps.select("u", cv.alias("gap_cv_raw"), "ng"), "u", "left")
    )
    night_share = F.col("n_night") / F.col("n_events").cast("double")
    high_rate = F.col("peak_rate") >= BOT_RATE_PER_MIN
    metronomic = (
        F.coalesce(F.col("gap_cv_raw") <= BOT_CV_MAX, F.lit(False))
        & (F.col("n_events") >= 10)
    )
    nocturnal = night_share >= BOT_NIGHT_SHARE
    return j.select(
        F.col("u").alias("user_id"),
        "n_events",
        "peak_rate",
        F.round("gap_cv_raw", round_digits).alias("gap_cv"),
        F.round(night_share, round_digits).alias("night_share"),
        high_rate.alias("high_rate"),
        metronomic.alias("metronomic"),
        nocturnal.alias("nocturnal"),
        (
            high_rate.cast("int")
            + metronomic.cast("int")
            + nocturnal.cast("int")
        ).alias("bot_score"),
    )


def depth_quality_audit(
    pages,
    url_col: str = "url",
    quality_col: str = "quality",
    round_digits: int = 6,
):
    """URL path depth vs content quality — the crawl-depth prior,
    measured.

    The folk rule behind depth-limited crawling (and the Kraaij
    entry-page priors in ``index/urlprior.py``): deeper URLs tend to
    carry thinner content, so frontiers de-prioritize by slash count.
    This audit replaces the folk rule with the measured curve: per
    path depth (count of '/' segments after the host), page count,
    mean quality and the lift vs the corpus mean — if the curve is
    flat on THIS corpus, depth-limiting is throwing away good pages.

    Per depth: (depth, n_pages, mean_quality, corpus_mean, lift).
    """
    from pyspark.sql import DataFrame

    path = F.regexp_replace(
        F.col(url_col), r"^https?://[^/]+", ""
    )
    depth = F.size(
        F.filter(F.split(path, "/"), lambda s: s != "")
    ).cast("long")
    per = pages.select(
        depth.alias("depth"),
        F.col(quality_col).cast("double").alias("q"),
    )
    corpus_mean = per.agg(F.avg("q").alias("m")).collect()[0].m
    return (
        per.groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.avg("q").alias("mq"),
        )
        .select(
            "depth",
            "n_pages",
            F.round("mq", round_digits).alias("mean_quality"),
            F.round(F.lit(corpus_mean), round_digits).alias(
                "corpus_mean"
            ),
            F.round(
                F.col("mq") / F.lit(float(corpus_mean)),
                round_digits,
            ).alias("lift"),
        )
    )
