"""CUPED — variance reduction for A/B experiment metrics using
pre-experiment data.

Deng, Xu, Kohavi & Walker, "Improving the sensitivity of online
controlled experiments by utilizing pre-experiment data" (WSDM 2013):
for user-level metric Y and any pre-experiment covariate X
(unaffected by treatment — here the user's pre-period activity),

    Y_cv   = Y - theta * (X - mean(X)),   theta = cov(X, Y) / var(X)

is an unbiased estimator of E[Y] with variance reduced by the factor
(1 - rho^2); the industry-standard trick that cuts experiment
runtimes roughly in half when week-over-week activity correlates.
theta is fit POOLED across arms (the paper's recommendation — a
per-arm theta would re-introduce bias under treatment effects on X).

Output, one row per arm: user counts, raw and CUPED-adjusted means,
sample variances of both estimators, the realized variance reduction
1 - var(Y_cv)/var(Y) (equals rho^2 in expectation), and the pooled
theta.

Scale shape: two hash aggregations (user rollup, then arm rollup)
plus one broadcast of the 1-row pooled-moments table; covariance via
sufficient statistics (sum, sum of squares, cross sum), so the whole
fit is a single distributed pass — no per-user collection.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuped_adjust(
    events: DataFrame,
    split_ts: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """(arm, n_users, theta, mean_y, mean_y_cv, var_y, var_y_cv,
    var_reduction): CUPED over per-user pre/post value sums; the arm
    is the deterministic user_id parity (the pinned assignment the
    oracle replays); ``split_ts`` separates pre-period (< split) from
    experiment period (>= split)."""
    per_user = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.sum(
                F.when(
                    F.col(ts_col) < F.lit(split_ts).cast("timestamp"),
                    F.col(value_col),
                ).otherwise(F.lit(0.0))
            ).alias("x"),
            F.sum(
                F.when(
                    F.col(ts_col) >= F.lit(split_ts).cast("timestamp"),
                    F.col(value_col),
                ).otherwise(F.lit(0.0))
            ).alias("y"),
        )
        .withColumn("arm", (F.col("u") % 2).cast("int"))
    )
    # sufficient statistics everywhere (sum / sum-of-squares / cross
    # sum) so the oracle can reproduce the exact same arithmetic —
    # streaming variance kernels differ across engines in the last ulps
    n = F.count(F.lit(1)).cast("double")
    pooled = per_user.agg(
        n.alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        (F.col("sx") / F.col("n")).alias("mx"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("theta"),
    )
    adj = per_user.crossJoin(F.broadcast(pooled)).withColumn(
        "y_cv",
        F.col("y") - F.col("theta") * (F.col("x") - F.col("mx")),
    )
    def var(s, ss, cn):
        return (
            F.col(ss) - F.col(s) * F.col(s) / F.col(cn)
        ) / (F.col(cn) - 1)
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("double").alias("na"),
            F.first("theta").alias("theta_raw"),
            F.sum("y").alias("sy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum("y_cv").alias("sc"),
            F.sum(F.col("y_cv") * F.col("y_cv")).alias("scc"),
        )
        .withColumn("var_y_raw", var("sy", "syy", "na"))
        .withColumn("var_cv_raw", var("sc", "scc", "na"))
        .select(
            "arm",
            F.col("na").cast("long").alias("n_users"),
            F.round("theta_raw", round_digits).alias("theta"),
            F.round(F.col("sy") / F.col("na"), round_digits).alias(
                "mean_y"
            ),
            F.round(F.col("sc") / F.col("na"), round_digits).alias(
                "mean_y_cv"
            ),
            F.round("var_y_raw", 3).alias("var_y"),
            F.round("var_cv_raw", 3).alias("var_y_cv"),
            F.round(
                F.lit(1.0) - F.col("var_cv_raw") / F.col("var_y_raw"),
                round_digits,
            ).alias("var_reduction"),
        )
    )


def prop_ztest(
    events: DataFrame,
    success_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    z_crit: float = 1.96,
    round_digits: int = 6,
) -> DataFrame:
    """Two-proportion z-test of a conversion rate between arms.

    The standard pooled two-sample test for binomial proportions
    (Fleiss, Levin & Paik, "Statistical Methods for Rates and
    Proportions"): with per-arm conversion counts x_i over n_i users,

        p_pool = (x_0 + x_1) / (n_0 + n_1)
        z = (p_1 - p_0)
            / sqrt(p_pool (1 - p_pool) (1/n_0 + 1/n_1))

    — the categorical-outcome sibling of the Welch t (``aggs.py``) and
    CUPED (above): conversion is a per-user 0/1 (did the user emit a
    ``success_type`` event), the arm is the pinned user-id parity.

    One row: (n0, n1, x0, x1, p0, p1, p_pool, z, significant).
    Scale shape: one user rollup, one 2-row arm rollup.
    """
    per_user = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.max(
                (F.col(type_col) == success_type).cast("int")
            ).alias("conv")
        )
        .withColumn("arm", (F.col("u") % 2).cast("int"))
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    wide = arms.groupBy().agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x1"),
    )
    p0 = F.col("x0") / F.col("n0")
    p1 = F.col("x1") / F.col("n1")
    pp = (F.col("x0") + F.col("x1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    # se = 0 when the pooled rate is exactly 0 or 1 (no variation on
    # either side) — there is nothing to test, pin z to 0
    z = F.when(se > 0, (p1 - p0) / se).otherwise(F.lit(0.0))
    return wide.select(
        "n0",
        "n1",
        F.col("x0").cast("long").alias("x0"),
        F.col("x1").cast("long").alias("x1"),
        F.round(p0, round_digits).alias("p0"),
        F.round(p1, round_digits).alias("p1"),
        F.round(pp, round_digits).alias("p_pool"),
        F.round(z, round_digits).alias("z"),
        (F.abs(z) > z_crit).alias("significant"),
    )


def did_estimate(
    events: DataFrame,
    split_ts: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Difference-in-differences treatment-effect estimate.

    The canonical two-period two-group DiD (Card & Krueger AER 1994
    popularized it; Angrist & Pischke, "Mostly Harmless Econometrics"
    §5): under the parallel-trends assumption the effect of treatment
    on the treated is

        DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre)

    over per-user period means — the pre-period difference nets out
    fixed group-level gaps that a naive post-only comparison would
    swallow.  Treatment = the pinned user-id parity, periods split at
    ``split_ts``.  One row: the four cell means, per-group deltas,
    and the DiD estimate with its naive-post-only counterpart so the
    bias the design removes is visible.

    Scale shape: one user-period rollup, one 4-cell rollup.
    """
    split = F.lit(split_ts).cast("timestamp")
    per = events.groupBy(
        F.col(user_col).alias("u"),
        F.when(F.col(ts_col) < split, "pre").otherwise("post").alias(
            "period"
        ),
    ).agg(F.avg(value_col).alias("m"))
    cells = per.withColumn(
        "arm", (F.col("u") % 2).cast("int")
    ).groupBy().agg(
        F.avg(
            F.when(
                (F.col("arm") == 1) & (F.col("period") == "post"),
                F.col("m"),
            )
        ).alias("treat_post"),
        F.avg(
            F.when(
                (F.col("arm") == 1) & (F.col("period") == "pre"),
                F.col("m"),
            )
        ).alias("treat_pre"),
        F.avg(
            F.when(
                (F.col("arm") == 0) & (F.col("period") == "post"),
                F.col("m"),
            )
        ).alias("ctrl_post"),
        F.avg(
            F.when(
                (F.col("arm") == 0) & (F.col("period") == "pre"),
                F.col("m"),
            )
        ).alias("ctrl_pre"),
    )
    return cells.select(
        F.round("treat_pre", round_digits).alias("treat_pre"),
        F.round("treat_post", round_digits).alias("treat_post"),
        F.round("ctrl_pre", round_digits).alias("ctrl_pre"),
        F.round("ctrl_post", round_digits).alias("ctrl_post"),
        F.round(
            F.col("treat_post") - F.col("treat_pre"), round_digits
        ).alias("treat_delta"),
        F.round(
            F.col("ctrl_post") - F.col("ctrl_pre"), round_digits
        ).alias("ctrl_delta"),
        F.round(
            (F.col("treat_post") - F.col("treat_pre"))
            - (F.col("ctrl_post") - F.col("ctrl_pre")),
            round_digits,
        ).alias("did"),
        F.round(
            F.col("treat_post") - F.col("ctrl_post"), round_digits
        ).alias("naive_post_diff"),
    )


def delta_method_ci(
    events: DataFrame,
    num_type: str = "click",
    den_type: str = "view",
    z: float = 1.96,
    user_col: str = "user_id",
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Delta-method confidence interval for a user-clustered ratio
    metric.

    Deng, Knoblich & Lu, "Applying the Delta method in metric
    analytics" (KDD 2018): session/event-level ratios like CTR =
    sum(clicks)/sum(views) violate the i.i.d. assumption because the
    unit of randomization is the USER; the delta method gives the
    correct variance from per-user aggregates (X_i, Y_i):

        r = sum X / sum Y = xbar / ybar
        var(r) ~ (var_x - 2 r cov_xy + r^2 var_y) / (n * ybar^2)

    Per arm (pinned user parity): (arm, n_users, ratio, se, ci_lo,
    ci_hi), plus sufficient-statistic moments computed with explicit
    sums for cross-engine exactness.

    Scale shape: one user rollup, one per-arm rollup.
    """
    per = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.sum(
                (F.col(type_col) == num_type).cast("double")
            ).alias("x"),
            F.sum(
                (F.col(type_col) == den_type).cast("double")
            ).alias("y"),
        )
        .withColumn("arm", (F.col("u") % 2).cast("int"))
    )
    agg = per.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    xbar = F.col("sx") / n
    ybar = F.col("sy") / n
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    r = xbar / ybar
    var_r = (var_x - 2 * r * cov + r * r * var_y) / (n * ybar * ybar)
    se = F.sqrt(var_r)
    return agg.select(
        "arm",
        n.cast("long").alias("n_users"),
        F.round(r, round_digits).alias("ratio"),
        F.round(se, round_digits).alias("se"),
        F.round(r - z * se, round_digits).alias("ci_lo"),
        F.round(r + z * se, round_digits).alias("ci_hi"),
    )


def ks_test(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    alpha_crit: float = 1.358,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between arms.

    Smirnov (1939): D = sup_x |F_1(x) - F_0(x)| over the two arms'
    empirical CDFs, rejected at level 0.05 when
    D > c(alpha) * sqrt((n0+n1)/(n0*n1)) with c(0.05) = 1.358 — the
    distribution-free WHOLE-SHAPE companion to the mean-only t/CUPED
    tests (a treatment that moves the tails but not the mean is
    invisible to them and loud here).  Exact D via the merged-sort
    cumulative-difference sweep — one ordered window over the pooled
    values, the same shape as the t-closeness EMD.

    One row: (n0, n1, d_stat, d_crit, significant).
    """
    from pyspark.sql import Window

    v = events.select(
        (F.col(user_col) % 2).cast("int").alias("arm"),
        F.col(value_col).cast("double").alias("x"),
    )
    counts = v.groupBy("arm").agg(F.count(F.lit(1)).alias("n"))
    cs = {r.arm: r.n for r in counts.collect()}
    n0, n1 = float(cs.get(0, 0)), float(cs.get(1, 0))
    w = Window.orderBy(F.col("x").asc(), F.col("arm").asc())
    cum = v.withColumn(
        "c0",
        F.sum((F.col("arm") == 0).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn(
        "c1",
        F.sum((F.col("arm") == 1).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    d = cum.agg(
        F.max(
            F.abs(
                F.col("c0") / F.lit(n0) - F.col("c1") / F.lit(n1)
            )
        ).alias("d")
    ).collect()[0].d
    d_crit = alpha_crit * ((n0 + n1) / (n0 * n1)) ** 0.5
    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (
                int(n0),
                int(n1),
                round(d, round_digits),
                round(d_crit, round_digits),
                bool(d > d_crit),
            )
        ],
        "n0 long, n1 long, d_stat double, d_crit double, "
        "significant boolean",
    )


POWER_Z_ALPHA = 1.959963984540054  # two-sided 0.05
POWER_Z_BETA = 0.8416212335729143  # power 0.80
MDE_GRID = (0.01, 0.05, 0.10)


def power_analysis(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    round_digits: int = 6,
) -> DataFrame:
    """Sample-size / MDE calculator from the measured metric variance.

    The standard two-sample power formula (Cohen 1988; every
    experimentation platform's sizing tab):

        n_per_arm = 2 (z_{a/2} + z_beta)^2 sigma^2 / delta^2

    at alpha = 0.05 two-sided and 80% power, with sigma^2 the
    MEASURED per-user metric variance (sufficient-statistic form) and
    delta expressed as a fraction of the metric mean (relative MDE).
    Also inverted: the MDE the CURRENT population could detect — the
    number that says whether an experiment idea is even runnable.

    Per MDE: (mde_rel, mean, sigma, n_per_arm_required, n_available,
    runnable).
    """
    per = events.groupBy(F.col(user_col).alias("u")).agg(
        F.sum(value_col).alias("x")
    )
    st = per.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    ).collect()[0]
    n, sm, ss = float(st.n), float(st.s), float(st.ss)
    mean = sm / n
    var = (ss - sm * sm / n) / (n - 1)
    sigma = var ** 0.5
    z2 = (POWER_Z_ALPHA + POWER_Z_BETA) ** 2
    spark = events.sparkSession
    rows = []
    for mde in MDE_GRID:
        delta = mde * mean
        req = 2.0 * z2 * var / (delta * delta)
        rows.append(
            (
                mde,
                round(mean, round_digits),
                round(sigma, round_digits),
                int(req) + 1,
                int(n // 2),
                bool(n // 2 >= req),
            )
        )
    return spark.createDataFrame(
        rows,
        "mde_rel double, mean double, sigma double, "
        "n_per_arm_required long, n_available long, "
        "runnable boolean",
    )


def simpsons_check(
    events: DataFrame,
    success_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Simpson's-paradox screen for the arm comparison — does the
    aggregate effect direction survive stratification?

    Simpson (JRSS-B 1951) / the Bickel et al. Berkeley admissions
    analysis (Science 1975): an aggregate rate difference can REVERSE
    inside every stratum when arm assignment correlates with a
    confounder.  The screen: compute the arm-1-minus-arm-0 conversion
    difference overall and within each stratum (here: the user's
    first-activity week — an exposure-time confounder), and flag a
    paradox when the aggregate sign disagrees with the
    stratum-majority sign.

    One row per stratum plus an 'overall' row: (stratum, n0, n1, p0,
    p1, diff, agrees_with_overall) — the paradox is visible as
    FALSE rows.
    """
    first_w = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("wk")
    )
    conv = events.groupBy(F.col(user_col).alias("u")).agg(
        F.max(
            (F.col(type_col) == success_type).cast("int")
        ).alias("c")
    )
    per = (
        first_w.join(conv, "u")
        .withColumn("arm", (F.col("u") % 2).cast("int"))
    )

    def rates(df, label_col):
        return df.groupBy(label_col).agg(
            F.sum((F.col("arm") == 0).cast("long")).alias("n0"),
            F.sum((F.col("arm") == 1).cast("long")).alias("n1"),
            (
                F.sum(
                    F.when(F.col("arm") == 0, F.col("c")).otherwise(0)
                )
                / F.sum((F.col("arm") == 0).cast("long")).cast(
                    "double"
                )
            ).alias("p0r"),
            (
                F.sum(
                    F.when(F.col("arm") == 1, F.col("c")).otherwise(0)
                )
                / F.sum((F.col("arm") == 1).cast("long")).cast(
                    "double"
                )
            ).alias("p1r"),
        )
    overall = rates(
        per.withColumn("stratum", F.lit("overall")), "stratum"
    )
    odiff = overall.select(
        (F.col("p1r") - F.col("p0r")).alias("od")
    ).collect()[0].od
    strata = rates(
        per.withColumn("stratum", F.col("wk").cast("string")),
        "stratum",
    )
    both = overall.unionByName(strata)
    diff = F.col("p1r") - F.col("p0r")
    return both.select(
        "stratum",
        "n0",
        "n1",
        F.round("p0r", round_digits).alias("p0"),
        F.round("p1r", round_digits).alias("p1"),
        F.round(diff, round_digits).alias("diff"),
        (F.signum(diff) == F.signum(F.lit(float(odiff)))).alias(
            "agrees_with_overall"
        ),
    )


# O'Brien-Fleming group-sequential z boundaries for K=3 equally
# spaced looks at two-sided alpha=.05 (Pocock/OBF tables; the
# canonical c * sqrt(K / k) shape with c = 2.004)
OBF_BOUNDS_K3 = (3.471, 2.454, 2.004)


def obrien_fleming_monitor(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming bounds.

    Peeking at a fixed-horizon test inflates false positives; the
    group-sequential fix (O'Brien & Fleming 1979) spends almost no
    alpha early — the K=3 boundary sequence 3.471 / 2.454 / 2.004
    — so an early stop needs an enormous effect.  Looks are the
    first three calendar weeks; the arm is the parity of the user
    id (the same deterministic split the other ab ops use); the
    statistic is the two-sample z on per-user metric sums,
    cumulative through each look.

    Per look: (look, week, n0, n1, z, bound, crossed).
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    first3 = (
        events.select(wk.alias("w"))
        .distinct()
        .orderBy("w")
        .limit(3)
        .collect()
    )
    weeks = [r.w for r in first3]
    spark = events.sparkSession
    parts = []
    for look, wend in enumerate(weeks, start=1):
        cum = events.filter(wk <= F.lit(wend))
        per = cum.groupBy(
            F.col(user_col).alias("u"),
            (F.col(user_col) % 2).alias("arm"),
        ).agg(F.sum(value_col).alias("x"))
        st = per.groupBy("arm").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("ss"),
        )
        rows = {r.arm: r for r in st.collect()}
        if 0 not in rows or 1 not in rows:
            continue
        r0, r1 = rows[0], rows[1]
        n0, n1 = float(r0.n), float(r1.n)
        m0, m1 = r0.s / n0, r1.s / n1
        v0 = (r0.ss - r0.s * r0.s / n0) / (n0 - 1) if n0 > 1 else 0.0
        v1 = (r1.ss - r1.s * r1.s / n1) / (n1 - 1) if n1 > 1 else 0.0
        se2 = v0 / n0 + v1 / n1
        z = (m1 - m0) / math.sqrt(se2) if se2 > 0 else None
        bound = OBF_BOUNDS_K3[look - 1]
        parts.append(
            (
                look,
                str(wend),
                int(n0),
                int(n1),
                round(z, round_digits) if z is not None else None,
                bound,
                bool(z is not None and abs(z) > bound),
            )
        )
    return spark.createDataFrame(
        parts,
        "look long, week string, n0 long, n1 long, z double,"
        " bound double, crossed boolean",
    )
