"""Benford's-law conformity audit of a numeric measure.

Benford (Proc. Am. Phil. Soc. 1938) / Newcomb (1881): in many
naturally-occurring positive measures spanning several orders of
magnitude, the first significant digit d appears with probability
log10(1 + 1/d) — the audit standard for fraud and data-quality
screening since Nigrini (J. Accounting Research 1996).  A metrics
column whose leading-digit distribution departs sharply from Benford
is a flag for synthetic padding, unit mix-ups, or clipped/defaulted
values — exactly the silent corruptions a 100-TB ingest wants caught
at the aggregation layer, not in a notebook.

Per group: the observed leading-digit shares against the Benford
expectation, the Pearson chi-square statistic

    chi2 = sum_d (O_d - n * p_d)^2 / (n * p_d)

and a flag at the 8-degrees-of-freedom 0.05 critical value (15.507).
The leading digit is closed-form integer arithmetic —
floor(v / 10^floor(log10 v)) — identical in Spark and the DuckDB
oracle; zero/negative values are excluded (they have no Benford
digit) but counted in ``n_excluded`` so the filter is visible.

Scale shape: one projection + two hash aggregations, grouped by
(group, digit) then group — no windows, no UDFs; digit cardinality
is 9, so the second stage is broadcast-sized regardless of input.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# chi-square 0.05 critical value, df = 8 (9 digits - 1)
CHI2_CRIT_8DF = 15.507


def benford_audit(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """(grp, digit, n_d, share, expected_p, n_pos, n_excluded, chi2,
    flagged): per-group leading-digit profile vs Benford, chi-square
    over all 9 digits (absent digits contribute n*p_d)."""
    v = F.col(value_col).cast("double")
    base = events.select(
        F.col(group_col).alias("grp"),
        F.when(
            v > 0,
            F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))),
        ).alias("digit"),
    )
    tot = base.groupBy("grp").agg(
        F.sum(F.col("digit").isNotNull().cast("long")).alias("n_pos"),
        F.sum(F.col("digit").isNull().cast("long")).alias("n_excluded"),
    )
    obs = (
        base.filter(F.col("digit").isNotNull())
        .groupBy("grp", "digit")
        .agg(F.count(F.lit(1)).alias("n_d"))
    )
    digits = events.sparkSession.createDataFrame(
        [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
        "digit long, expected_p double",
    )
    grid = (
        tot.crossJoin(F.broadcast(digits))
        .join(obs, ["grp", "digit"], "left")
        .na.fill({"n_d": 0})
    )
    # groups with no positive values (n_pos = 0) have no Benford test
    # to run: every chi-square term would be 0/0 (an ANSI-mode error).
    # try_divide turns those terms null, so such groups get an EXPLICIT
    # null chi2/flagged (ADVICE r03) — n_excluded carries the reason.
    chi = grid.groupBy("grp").agg(
        F.sum(
            F.try_divide(
                F.pow(
                    F.col("n_d")
                    - F.col("n_pos") * F.col("expected_p"),
                    2,
                ),
                F.col("n_pos") * F.col("expected_p"),
            )
        ).alias("chi2")
    )
    return (
        grid.join(chi, "grp")
        .select(
            "grp",
            "digit",
            "n_d",
            F.round(
                F.try_divide(F.col("n_d"), F.col("n_pos")),
                round_digits,
            ).alias("share"),
            F.round("expected_p", round_digits).alias("expected_p"),
            "n_pos",
            "n_excluded",
            F.round("chi2", round_digits).alias("chi2"),
            F.when(
                F.col("chi2").isNotNull(),
                F.col("chi2") > CHI2_CRIT_8DF,
            ).alias("flagged"),
        )
    )
