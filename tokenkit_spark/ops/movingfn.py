"""Sliding-window smoothing over calendar bucket series — the
Elasticsearch ``moving_fn`` pipeline aggregation with the ``ewma`` and
``holt`` model functions.

ES runs ``moving_fn`` over a date_histogram's bucket values with a
trailing window that (at the default ``shift=0``) EXCLUDES the current
bucket, and its ``MovingFunctions.ewma`` seeds the running average with
the first value in the window, then folds ``avg = alpha*v +
(1-alpha)*avg`` over the rest.  ``holt`` is double-exponential
smoothing (Holt, "Forecasting seasonals and trends by exponentially
weighted moving averages", 1957; Hyndman & Athanasopoulos FPP §7.2):

    l_t = alpha*v_t + (1-alpha)*(l_{t-1} + b_{t-1})
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

initialized here with l_1 = v_1, b_1 = 0 (the pinned convention shared
with the SQL oracle), reporting the one-step-ahead forecast l + b.

Both are *ordered folds*, which stay fully declarative: the trailing
window materializes as a bounded array (window size, never row count)
and ``F.aggregate`` — Catalyst's higher-order fold — runs the
recurrence JVM-side.  No UDFs, no driver state; series parallelize on
the group key and buckets are zero-filled calendar days (min_doc_count
= 0 — empty buckets participate, per the ES contract; see
ops/changepoint.py for the shared bucket builder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tokenkit_spark.ops.changepoint import daily_buckets_zero_filled


def _trailing_vals(window: int):
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(-window, -1)
    )
    return F.collect_list(F.col("n").cast("double")).over(w)


def _ewma_fold(vals, alpha: float):
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    return F.when(
        F.size(vals) > 0,
        F.aggregate(
            rest,
            F.element_at(vals, 1),
            lambda acc, x: F.lit(float(alpha)) * x
            + F.lit(1.0 - alpha) * acc,
        ),
    )


def _holt_fold(vals, alpha: float, beta: float):
    a, b = F.lit(float(alpha)), F.lit(float(beta))
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    init = F.struct(
        F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
    )

    def step(acc, x):
        l_new = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (b * (l_new - acc["l"]) + (F.lit(1.0) - b) * acc["b"]).alias(
                "b"
            ),
        )

    fin = F.aggregate(rest, init, step)
    return F.when(F.size(vals) > 0, fin["l"] + fin["b"])


def moving_fn(
    events: DataFrame,
    window: int = 5,
    alpha: float = 0.3,
    beta: float = 0.1,
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """One row per (group, calendar day): the bucket count plus the
    EWMA and Holt smoothings of the TRAILING ``window`` buckets
    (current bucket excluded — ES shift=0).  The first bucket of each
    series has an empty window and NULL smoothings, like ES."""
    b = daily_buckets_zero_filled(events, group_col, ts_col)
    vals = _trailing_vals(window)
    out = b.select(
        F.col("grp").alias(group_col),
        "day",
        "n",
        F.round(_ewma_fold(vals, alpha), round_digits).alias("ewma"),
        F.round(_holt_fold(vals, alpha, beta), round_digits).alias("holt"),
    )
    return out
