"""Session-L batch 23: rolling backtest, log templates, ingest lag,
robots delta."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


# ---------------------------------------------------------------- backtest
def test_rolling_backtest_weekly_cycle_wins(spark):
    from tokenkit_spark.ops.trend import rolling_backtest

    rows = []
    eid = 0
    for day in range(1, 57):
        n = 25 if (day - 1) % 7 == 0 else 5
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1)
                 + dt.timedelta(days=day - 1, hours=12), 1, "a", 1.0)
            )
            eid += 1
    out = rolling_backtest(_ev(spark, rows)).collect()
    assert len(out) == 3  # three origins
    # the exact weekly cycle makes seasonal-naive perfect everywhere
    assert all(r.winner == "seasonal" for r in out)
    assert all(r.mae_snaive == 0.0 for r in out)


# ------------------------------------------------------------ log templates
def test_log_templates_parameterization(spark):
    from tokenkit_spark.ops.searchlog import log_templates

    logs = spark.createDataFrame(
        [
            ("ERROR timeout id=17",),
            ("ERROR timeout id=42",),
            ("ERROR timeout id=99",),
            ("WARN disk low",),
        ],
        "message string",
    )
    out = {r.first_token: r for r in log_templates(logs).collect()}
    e = out["ERROR"]
    assert e.template == "ERROR timeout <*>"
    assert e.n_messages == 3 and e.n_param_slots == 1
    assert out["WARN"].template == "WARN disk low"
    assert out["WARN"].n_param_slots == 0


# -------------------------------------------------------------- ingest lag
def test_ingest_lag_quantiles_and_late_fracs(spark):
    from tokenkit_spark.streaming.stats import ingest_lag_audit

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, base, 1, "a", 1.0) for i in range(1000)]
    ev = _ev(spark, rows)
    # lag = event_id % 1000 seconds -> uniform 0..999
    ingest = F.timestamp_seconds(
        F.unix_timestamp("ts") + F.col("event_id") % 1000
    )
    r = ingest_lag_audit(ev, ingest).collect()[0]
    assert r.p50_lag_s == pytest.approx(499.5, abs=1.0)
    assert r.late_frac_300s == pytest.approx(0.699, abs=0.01)
    assert r.late_frac_900s == pytest.approx(0.099, abs=0.01)


# ------------------------------------------------------------ robots delta
def test_robots_delta_blocking(spark):
    from tokenkit_spark.ops.robots import robots_delta_audit

    urls = spark.createDataFrame(
        [
            ("h", "/keep/a"),
            ("h", "/gone/b"),
            ("h", "/gone/keepme"),
            ("h", "/freed/c"),
        ],
        "host string, path string",
    )
    hosts = urls.select("host").distinct()
    r_old = hosts.select(
        "host",
        F.lit("User-agent: *\nDisallow: /freed/\n").alias("body"),
    )
    r_new = hosts.select(
        "host",
        F.lit(
            "User-agent: *\nDisallow: /gone/\nAllow: /gone/keepme\n"
        ).alias("body"),
    )
    r = robots_delta_audit(urls, r_old, r_new).collect()[0]
    assert r.n_urls == 4
    assert r.allowed_old == 3  # /freed/c blocked before
    assert r.allowed_new == 3  # /gone/b blocked now
    assert r.newly_blocked == 1 and r.newly_allowed == 1
    assert r.churn_frac == pytest.approx(0.5)
