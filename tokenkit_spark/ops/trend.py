"""Robust trend estimation over event-count time series — Theil-Sen
slopes and the Mann-Kendall trend test.

The monitoring twin of the parametric OLS fits elsewhere in this repo
(``textstats.heaps_fit``, ``events``' pipeline aggs): crawl/traffic
series are heavy-tailed and spiky, so the robust pair — a median-of-
pairwise-slopes estimator and a rank-based significance test — is the
standard kit (it is what anomaly platforms run per metric):

* Theil (1950) / Sen (JASA 1968): slope = median over all i<j of
  (y_j - y_i)/(x_j - x_i); breakdown point ~29%, no residual
  distribution assumed.  Intercept per Sen: median of y_i - b*x_i.
* Mann (1945) / Kendall: S = sum over i<j of sign(y_j - y_i); under
  H0 Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)]/18 with the tie
  correction over groups of equal y, and the continuity-corrected
  z = (S -/+ 1)/sqrt(Var(S)) is asymptotically normal (the Hirsch et
  al. WRR 1982 hydrology formulation everyone implements).

Scale shape: the series here is ONE ROW PER (group, day) — tiny after
the first aggregation — so the O(n^2) pair self-join is per-group
work over n<=hundreds of days and stays fully distributed across
groups.  Exact medians via a per-group sort window (two middle
elements averaged, matching DuckDB's ``median``); no sampling, no
driver math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _daily(events: DataFrame, ts_col: str, group_col: str) -> DataFrame:
    return events.groupBy(
        F.col(group_col).alias("grp"),
        F.datediff(
            F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))


def theil_sen(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """(grp, n_days, n_pairs, slope, intercept): Theil-Sen robust
    trend of the daily event count per group."""
    d = _daily(events, ts_col, group_col)
    a = d.select("grp", F.col("day").alias("xi"), F.col("y").alias("yi"))
    b = d.select("grp", F.col("day").alias("xj"), F.col("y").alias("yj"))
    pairs = a.join(b, "grp").filter(F.col("xj") > F.col("xi"))
    slopes = pairs.select(
        "grp",
        ((F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))).alias(
            "s"
        ),
    )
    slope = slopes.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_pairs"), F.median("s").alias("slope")
    )
    inter = (
        d.join(slope.select("grp", "slope"), "grp")
        .select(
            "grp", (F.col("y") - F.col("slope") * F.col("day")).alias("c")
        )
        .groupBy("grp")
        .agg(F.median("c").alias("intercept"))
    )
    nd = d.groupBy("grp").agg(F.count(F.lit(1)).alias("n_days"))
    # LEFT joins from the n_days rollup: a group observed on a single
    # day has no pairs, hence no slope — it stays VISIBLE with
    # n_pairs = 0 and null slope/intercept instead of silently
    # vanishing from the audit (ADVICE r03)
    return (
        nd.join(slope, "grp", "left")
        .join(inter, "grp", "left")
        .select(
            "grp",
            "n_days",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.round("slope", round_digits).alias("slope"),
            F.round("intercept", round_digits).alias("intercept"),
        )
    )


def mann_kendall(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    z_crit: float = 1.96,
    round_digits: int = 6,
) -> DataFrame:
    """(grp, n_days, s_stat, var_s, z, trend): tie-corrected
    Mann-Kendall on the daily count series; trend is
    'increasing'/'decreasing'/'no_trend' at ``z_crit``."""
    d = _daily(events, ts_col, group_col)
    a = d.select("grp", F.col("day").alias("xi"), F.col("y").alias("yi"))
    b = d.select("grp", F.col("day").alias("xj"), F.col("y").alias("yj"))
    s = (
        a.join(b, "grp")
        .filter(F.col("xj") > F.col("xi"))
        .groupBy("grp")
        .agg(
            F.sum(
                F.signum(F.col("yj") - F.col("yi")).cast("long")
            ).alias("s_stat")
        )
    )
    nd = d.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        d.groupBy("grp", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("grp")
        .agg(
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.coalesce(F.col("tie_term"), F.lit(0))
    ) / 18.0
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0))
    )
    # LEFT join from the n_days rollup (ADVICE r03): single-day groups
    # have no pairs, hence no S statistic — they stay visible with null
    # s_stat/z/trend rather than dropping out of the audit
    out = (
        nd.join(s, "grp", "left")
        .join(ties, "grp", "left")
        .withColumn("var_s", var_s)
        .withColumn("z", F.when(F.col("s_stat").isNotNull(), z))
    )
    return out.select(
        "grp",
        F.col("n").alias("n_days"),
        "s_stat",
        F.round("var_s", round_digits).alias("var_s"),
        F.round("z", round_digits).alias("z"),
        F.when(F.col("z") > z_crit, F.lit("increasing"))
        .when(F.col("z") < -z_crit, F.lit("decreasing"))
        .when(F.col("z").isNotNull(), F.lit("no_trend"))
        .alias("trend"),
    )


def mase_eval(
    events: DataFrame,
    season: int = 7,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Forecast-baseline evaluation on the daily count series: naive-1
    vs seasonal-naive, MAE and MASE.

    Hyndman & Koehler, "Another look at measures of forecast accuracy"
    (IJF 2006): scale-free comparison of forecasters via MASE — the
    MAE of a method divided by the in-sample MAE of the (seasonal)
    naive forecast.  Here both canonical baselines are evaluated
    one-step-ahead on the series itself:

        naive-1:        yhat_t = y_{t-1}
        seasonal-naive: yhat_t = y_{t-season}

    over the days where both are defined (so the two MAEs cover the
    SAME evaluation set), plus mase_naive1 = mae_naive1 / mae_snaive.
    mase < 1 means even the trivial last-value forecast beats the
    weekly-seasonal baseline — i.e. the series has no usable weekly
    cycle, which is exactly the decision input for the recrawl/
    capacity schedulers (``ops/recrawl.py``, ``index/capacity.py``).

    One lag window per group over the daily rollup; a gap in the
    calendar leaves lag rows misaligned, so days are joined by
    explicit day arithmetic, not row position.
    """
    d = _daily(events, ts_col, group_col)
    cur = d.select("grp", F.col("day").alias("d0"), F.col("y").alias("y0"))
    l1 = d.select("grp", (F.col("day") + 1).alias("d0"),
                  F.col("y").alias("y1"))
    ls = d.select("grp", (F.col("day") + season).alias("d0"),
                  F.col("y").alias("ys"))
    j = cur.join(l1, ["grp", "d0"]).join(ls, ["grp", "d0"])
    agg = j.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.avg(F.abs(F.col("y0") - F.col("y1"))).alias("mae_naive1"),
        F.avg(F.abs(F.col("y0") - F.col("ys"))).alias("mae_snaive"),
    )
    return agg.select(
        "grp",
        "n_eval",
        F.round("mae_naive1", round_digits).alias("mae_naive1"),
        F.round("mae_snaive", round_digits).alias("mae_snaive"),
        F.round(
            F.when(
                F.col("mae_snaive") != 0,
                F.col("mae_naive1") / F.col("mae_snaive"),
            ),
            round_digits,
        ).alias("mase_naive1"),
        F.when(F.col("mae_snaive") < F.col("mae_naive1"),
               F.lit("seasonal"))
        .otherwise(F.lit("naive1"))
        .alias("better_baseline"),
    )


def acf_ljung_box(
    events: DataFrame,
    max_lag: int = 10,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Autocorrelation function + Ljung-Box portmanteau statistic of
    the daily count series.

    Box & Jenkins (1970) sample ACF with Ljung & Box, "On a measure
    of lack of fit in time series models" (Biometrika 1978):

        r_h = sum_{t=h+1..n} (y_t - ybar)(y_{t-h} - ybar)
              / sum_t (y_t - ybar)^2
        Q_H = n (n + 2) * sum_{h=1..H} r_h^2 / (n - h)

    Q ~ chi2(H) under white noise — the standard "is there ANY serial
    structure" gate run before fitting seasonality (the weekly cycle
    ``weekday_profile`` profiles shows up here as a spike at lag 7).
    Lags are joined by explicit day arithmetic (a calendar gap breaks
    a lag pair rather than silently misaligning it).

    One row per (group, lag): (grp, lag, n_days, acf, q_stat,
    q_signif) with q_stat cumulative through that lag and q_signif
    the chi2 0.05 exceedance using the Wilson-Hilferty closed-form
    critical value (no lookup table, identical in both engines).
    """
    d = _daily(events, ts_col, group_col)
    stats = d.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.avg("y").alias("ybar")
    )
    dev = d.join(stats, "grp").select(
        "grp", "day", (F.col("y") - F.col("ybar")).alias("e"), "n"
    )
    denom = dev.groupBy("grp").agg(
        F.sum(F.col("e") * F.col("e")).alias("ss")
    )
    lags = events.sparkSession.range(1, max_lag + 1).select(
        F.col("id").alias("lag")
    )
    cur = dev.select("grp", "day", F.col("e").alias("e0"))
    past = dev.select(
        "grp", F.col("day").alias("pday"), F.col("e").alias("eh")
    )
    pairs = (
        cur.crossJoin(F.broadcast(lags))
        .join(
            past,
            (F.col("pday") == F.col("day") - F.col("lag"))
            & (cur.grp == past.grp),
        )
        .drop(past.grp)
    )
    acf = (
        pairs.groupBy("grp", "lag")
        .agg(F.sum(F.col("e0") * F.col("eh")).alias("num"))
        .join(denom, "grp")
        .join(stats.select("grp", "n"), "grp")
        .select(
            "grp",
            "lag",
            F.col("n").alias("n_days"),
            F.when(
                F.col("ss") != 0, F.col("num") / F.col("ss")
            ).alias("r"),
        )
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col("n_days").cast("double")
    q = (
        n
        * (n + 2)
        * F.sum(
            F.col("r") * F.col("r") / (n - F.col("lag"))
        ).over(wcum)
    )
    # Wilson-Hilferty chi2(h) 95% critical value:
    # h * (1 - 2/(9h) + 1.6449 * sqrt(2/(9h)))^3
    h = F.col("lag").cast("double")
    crit = h * F.pow(
        1.0 - 2.0 / (9.0 * h)
        + F.lit(1.6448536269514722) * F.sqrt(2.0 / (9.0 * h)),
        3.0,
    )
    return (
        acf.withColumn("q_raw", q)
        .select(
            "grp",
            "lag",
            "n_days",
            F.round("r", round_digits).alias("acf"),
            F.round("q_raw", round_digits).alias("q_stat"),
            (F.col("q_raw") > crit).alias("q_signif"),
        )
    )


def periodogram(
    events: DataFrame,
    max_period: int = 10,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Schuster periodogram of the daily count series — spectral
    power at candidate periods.

    Schuster (1898), the classical DFT power estimate at period p
    over a mean-centered series of n days:

        I(p) = (1/n) * [ (sum_t e_t cos(2 pi t / p))^2
                        + (sum_t e_t sin(2 pi t / p))^2 ]

    evaluated at integer candidate periods 2..``max_period`` — the
    frequency-domain twin of the lag-domain ACF (``acf_ljung_box``):
    a weekly cycle shows as the p=7 peak.  Closed-form sums of
    cos/sin projections — one trig projection + hash aggregate per
    group, no FFT machinery needed at 10 candidate periods.

    Per (grp, period): (grp, period, n_days, power, is_peak) with
    is_peak marking the argmax period per group.
    """
    import math

    from pyspark.sql import Window

    d = _daily(events, ts_col, group_col)
    stats = d.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.avg("y").alias("ybar")
    )
    dev = d.join(stats, "grp").select(
        "grp", "day", (F.col("y") - F.col("ybar")).alias("e"), "n"
    )
    periods = events.sparkSession.range(2, max_period + 1).select(
        F.col("id").alias("period")
    )
    two_pi = 2.0 * math.pi
    proj = (
        dev.crossJoin(F.broadcast(periods))
        .groupBy("grp", "period")
        .agg(
            F.first("n").alias("n_days"),
            F.sum(
                F.col("e")
                * F.cos(
                    F.lit(two_pi) * F.col("day") / F.col("period")
                )
            ).alias("c"),
            F.sum(
                F.col("e")
                * F.sin(
                    F.lit(two_pi) * F.col("day") / F.col("period")
                )
            ).alias("s"),
        )
        .withColumn(
            "power",
            (F.col("c") * F.col("c") + F.col("s") * F.col("s"))
            / F.col("n_days"),
        )
    )
    wp = Window.partitionBy("grp")
    return proj.select(
        "grp",
        "period",
        "n_days",
        F.round("power", round_digits).alias("power"),
        (
            F.round("power", 6)
            == F.max(F.round("power", 6)).over(wp)
        ).alias("is_peak"),
    )


BACKTEST_ORIGINS = 3
BACKTEST_HORIZON = 7


def rolling_backtest(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Rolling-origin forecast backtest — naive-1 vs seasonal-naive
    over multiple train/test splits.

    Tashman, "Out-of-sample tests of forecasting accuracy" (IJF 2000):
    a single holdout overstates whatever regime it lands in; the
    standard protocol re-fits at several ORIGINS and averages the
    horizon error.  Here the last ``BACKTEST_ORIGINS`` * horizon days
    are split into consecutive 7-day test windows; in each, naive-1
    carries the last pre-origin value flat and seasonal-naive repeats
    the final pre-origin week — the same baselines ``mase_eval``
    scores in-sample, now evaluated the honest way.

    Per (grp, origin): (grp, origin_day, mae_naive1, mae_snaive,
    winner).  Day-arithmetic joins only — no per-origin refit state.
    """
    d = _daily(events, ts_col, group_col)
    maxd = d.groupBy("grp").agg(F.max("day").alias("mx"))
    out = None
    for o in range(BACKTEST_ORIGINS, 0, -1):
        # origin = mx - o*7: train <= origin, test = next 7 days
        j = d.join(maxd, "grp").withColumn(
            "origin", F.col("mx") - o * BACKTEST_HORIZON
        )
        test = j.filter(
            (F.col("day") > F.col("origin"))
            & (F.col("day") <= F.col("origin") + BACKTEST_HORIZON)
        )
        last_val = (
            j.filter(F.col("day") == F.col("origin"))
            .select("grp", F.col("y").alias("naive1"))
        )
        season = j.filter(
            (F.col("day") > F.col("origin") - BACKTEST_HORIZON)
            & (F.col("day") <= F.col("origin"))
        ).select(
            "grp",
            (F.col("day") + BACKTEST_HORIZON).alias("day"),
            F.col("y").alias("snaive"),
        )
        ev = (
            test.join(last_val, "grp")
            .join(season, ["grp", "day"])
            .groupBy("grp", "origin")
            .agg(
                F.round(
                    F.avg(F.abs(F.col("y") - F.col("naive1"))),
                    round_digits,
                ).alias("mae_naive1"),
                F.round(
                    F.avg(F.abs(F.col("y") - F.col("snaive"))),
                    round_digits,
                ).alias("mae_snaive"),
            )
        )
        row = ev.select(
            "grp",
            F.col("origin").alias("origin_day"),
            "mae_naive1",
            "mae_snaive",
            F.when(
                F.col("mae_snaive") < F.col("mae_naive1"), "seasonal"
            )
            .otherwise("naive1")
            .alias("winner"),
        )
        out = row if out is None else out.unionByName(row)
    return out
