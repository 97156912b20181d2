"""Session-L batch 2: Theil-Sen, Mann-Kendall, Benford, CUPED, Gini
concentration, AMS F2 sketch."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )


# -------------------------------------------------------------- theil-sen
def test_theil_sen_exact_linear_series(spark):
    from tokenkit_spark.ops.trend import theil_sen

    # k events on day k -> daily count y = day index + 1 -> slope 1
    rows = []
    for day in range(6):
        for _ in range(day + 1):
            rows.append(
                (dt.datetime(2024, 1, 1 + day, 12, 0), 1, "a", 1.0)
            )
    out = theil_sen(_ev(spark, rows)).collect()[0]
    assert out.n_days == 6 and out.n_pairs == 15
    assert out.slope == pytest.approx(1.0)
    # y = day - 19723 + 1 -> intercept vs epoch-day x axis
    epoch0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert out.intercept == pytest.approx(1.0 - epoch0)


def test_theil_sen_robust_to_one_outlier(spark):
    from tokenkit_spark.ops.trend import theil_sen

    rows = []
    for day in range(9):
        n = 5 if day != 4 else 500  # spike day
        for _ in range(n):
            rows.append(
                (dt.datetime(2024, 1, 1 + day, 12, 0), 1, "a", 1.0)
            )
    out = theil_sen(_ev(spark, rows)).collect()[0]
    # median slope ignores the spike: flat series -> slope 0
    assert out.slope == pytest.approx(0.0)


# ----------------------------------------------------------- mann-kendall
def test_mann_kendall_monotone_up(spark):
    from tokenkit_spark.ops.trend import mann_kendall

    rows = []
    for day in range(10):
        for _ in range(day + 1):
            rows.append(
                (dt.datetime(2024, 1, 1 + day, 12, 0), 1, "a", 1.0)
            )
    out = mann_kendall(_ev(spark, rows)).collect()[0]
    # all 45 pairs increasing
    assert out.s_stat == 45
    assert out.trend == "increasing"
    # no ties: var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125
    assert out.var_s == pytest.approx(125.0)
    assert out.z == pytest.approx(44 / 125**0.5, abs=1e-5)


def test_mann_kendall_flat_is_no_trend(spark):
    from tokenkit_spark.ops.trend import mann_kendall

    rows = [
        (dt.datetime(2024, 1, 1 + day, 12, 0), 1, "a", 1.0)
        for day in range(8)
    ]
    out = mann_kendall(_ev(spark, rows)).collect()[0]
    assert out.s_stat == 0 and out.z == 0.0 and out.trend == "no_trend"


# ---------------------------------------------------------------- benford
def test_benford_digit_extraction_and_chi2(spark):
    from tokenkit_spark.ops.benford import benford_audit

    # values engineered: leading digits 1,1,2,9; one non-positive
    rows = [
        (dt.datetime(2024, 1, 1), 1, "a", 1.23),
        (dt.datetime(2024, 1, 1), 1, "a", 1500.0),
        (dt.datetime(2024, 1, 1), 1, "a", 0.029),
        (dt.datetime(2024, 1, 1), 1, "a", 92.0),
        (dt.datetime(2024, 1, 1), 1, "a", 0.0),
    ]
    out = benford_audit(_ev(spark, rows)).collect()
    assert len(out) == 9  # full digit grid
    by_d = {r.digit: r for r in out}
    assert by_d[1].n_d == 2 and by_d[2].n_d == 1 and by_d[9].n_d == 1
    assert by_d[1].n_pos == 4 and by_d[1].n_excluded == 1
    assert by_d[1].share == pytest.approx(0.5)
    assert by_d[1].expected_p == pytest.approx(0.30103, abs=1e-5)


def test_benford_conforming_sample_not_flagged(spark):
    import math

    from tokenkit_spark.ops.benford import benford_audit

    # construct counts proportional to Benford itself
    rows = []
    for d in range(1, 10):
        n = round(1000 * math.log10(1 + 1 / d))
        rows.extend(
            (dt.datetime(2024, 1, 1), 1, "a", float(d)) for _ in range(n)
        )
    out = benford_audit(_ev(spark, rows)).collect()
    assert all(not r.flagged for r in out)
    assert all(r.chi2 < 1.0 for r in out)


# ------------------------------------------------------------------ cuped
def test_cuped_reduces_variance_when_correlated(spark):
    from tokenkit_spark.ops.abtest import cuped_adjust

    # per-user level u: pre ~ u, post ~ u + small arm effect
    rows = []
    for u in range(40):
        rows.append((dt.datetime(2024, 1, 5), u, "a", float(u)))
        rows.append(
            (dt.datetime(2024, 1, 25), u, "a", float(u) + (u % 2) * 0.5)
        )
    out = cuped_adjust(
        _ev(spark, rows), split_ts="2024-01-16 00:00:00"
    ).collect()
    assert len(out) == 2
    for r in out:
        # X fully explains Y's spread -> massive variance reduction
        assert r.var_reduction > 0.99
        assert r.theta == pytest.approx(1.0, abs=0.01)


def test_cuped_means_preserved(spark):
    from tokenkit_spark.ops.abtest import cuped_adjust

    rows = []
    for u in range(30):
        rows.append((dt.datetime(2024, 1, 5), u, "a", float(u * u % 17)))
        rows.append((dt.datetime(2024, 1, 25), u, "a", float(u % 7)))
    out = cuped_adjust(
        _ev(spark, rows), split_ts="2024-01-16 00:00:00"
    ).collect()
    # pooled mean of the adjustment term is 0 -> overall mean shift is 0
    tot_y = sum(r.mean_y * r.n_users for r in out)
    tot_cv = sum(r.mean_y_cv * r.n_users for r in out)
    assert tot_cv == pytest.approx(tot_y, abs=1e-3)


# ------------------------------------------------------------------- gini
def test_gini_extremes(spark):
    from tokenkit_spark.ops.concentration import gini_concentration

    rows = []
    # 'flat': 10 users x 4 events each -> gini 0
    for u in range(10):
        rows.extend(
            (dt.datetime(2024, 1, 1), u, "flat", 1.0) for _ in range(4)
        )
    # 'skew': user 0 has 91 events, users 1..9 have 1 -> near-max gini
    rows.extend(
        (dt.datetime(2024, 1, 1), 0, "skew", 1.0) for _ in range(91)
    )
    for u in range(1, 10):
        rows.append((dt.datetime(2024, 1, 1), u, "skew", 1.0))
    out = {r.grp: r for r in gini_concentration(_ev(spark, rows)).collect()}
    assert out["flat"].gini == pytest.approx(0.0)
    assert out["skew"].gini > 0.8
    assert out["skew"].top1_share == pytest.approx(0.91)
    # top decile = top-1 key out of 10
    assert out["skew"].top_decile_share == pytest.approx(0.91)


# --------------------------------------------------------------------- ams
def test_ams_f2_exact_and_estimate(spark):
    from tokenkit_spark.ops.ams import ams_f2

    # group 'a': counts 3,1 -> F2 = 10
    rows = [
        (dt.datetime(2024, 1, 1), 7, "a", 1.0),
        (dt.datetime(2024, 1, 1), 7, "a", 1.0),
        (dt.datetime(2024, 1, 1), 7, "a", 1.0),
        (dt.datetime(2024, 1, 1), 8, "a", 1.0),
    ]
    out = ams_f2(_ev(spark, rows)).collect()[0]
    assert out.exact_f2 == 10 and out.n_keys == 2
    # with 2 keys the estimate is X^2 where X = +-3 +- 1 -> in {4,16,10-ish}
    assert out.est_f2 >= 0


def test_ams_f2_reasonable_on_many_keys(spark):
    from tokenkit_spark.ops.ams import ams_f2

    rows = [
        (dt.datetime(2024, 1, 1), u % 50, "a", 1.0) for u in range(500)
    ]
    out = ams_f2(_ev(spark, rows)).collect()[0]
    # 50 keys x 10 -> F2 = 5000; AMS median-of-means within ~2x
    assert out.exact_f2 == 5000
    assert abs(out.rel_err) < 1.0


def test_trend_single_day_group_stays_visible(spark):
    """ADVICE r03: a group observed on only one day must appear in the
    trend audits with null slope/z, not silently vanish."""
    import datetime as dt

    from tokenkit_spark.ops.trend import mann_kendall, theil_sen

    rows = [
        (dt.datetime(2024, 1, 1 + d, 9), 1, "steady", 1.0)
        for d in range(5)
    ] + [(dt.datetime(2024, 1, 3, 9), 2, "oneday", 1.0)]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    ts = {r.grp: r for r in theil_sen(ev).collect()}
    assert "oneday" in ts
    assert ts["oneday"].n_days == 1 and ts["oneday"].n_pairs == 0
    assert ts["oneday"].slope is None
    assert ts["steady"].slope is not None
    mk = {r.grp: r for r in mann_kendall(ev).collect()}
    assert "oneday" in mk
    assert mk["oneday"].s_stat is None and mk["oneday"].z is None
    assert mk["oneday"].trend is None
    assert mk["steady"].trend is not None


def test_benford_all_nonpositive_group_explicit_null(spark):
    """ADVICE r03: a group whose values are all <= 0 gets an explicit
    null chi2/flagged (n_excluded carries the reason), never a
    spurious flagged=False."""
    import datetime as dt

    from tokenkit_spark.ops.benford import benford_audit

    rows = [
        (dt.datetime(2024, 1, 1, 9), 1, "neg", -5.0),
        (dt.datetime(2024, 1, 1, 10), 2, "neg", 0.0),
    ] + [
        (dt.datetime(2024, 1, 1, 9 + (i % 12)), i, "pos",
         float(1 + i % 9) * 10)
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    out = benford_audit(ev).collect()
    neg = [r for r in out if r.grp == "neg"]
    assert neg and all(r.chi2 is None and r.flagged is None for r in neg)
    assert all(r.n_excluded == 2 and r.n_pos == 0 for r in neg)
    pos = [r for r in out if r.grp == "pos"]
    assert pos and all(r.chi2 is not None for r in pos)
