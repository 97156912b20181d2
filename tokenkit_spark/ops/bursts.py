"""Kleinberg burst detection over the daily event stream.

Kleinberg, "Bursty and hierarchical structure in streams" (KDD 2002),
the two-state ENUMERATE/batch variant (§4): each day t contributes
(r_t relevant out of d_t total); a 2-state automaton emits at base
rate p0 = R/D or burst rate p1 = s*p0, day t in state q costs the
binomial negative log-likelihood

    fit_q(t) = -( r_t ln p_q + (d_t - r_t) ln(1 - p_q) )

(the state-independent binomial coefficient cancels), and entering the
burst state costs gamma * ln(T). The minimum-cost state sequence marks
the burst intervals; a burst's WEIGHT is its total fit saving
sum(fit0 - fit1) — Kleinberg's ranking weight (§4, eq. for w).

State recovery is the forward/backward decomposition rather than
explicit backpointers: the optimal path's state at t is
argmin_q fwd(t,q) + bwd(t,q) (ties to state 0) — chosen because it
unrolls to SQL as 2T scalar CTE levels with no backtrack pass, and the
Spark kernel applies the SAME rule so engines agree exactly.

Scale shape: the DP is genuinely sequential in t but tiny (T days, 2
states) and embarrassingly parallel across groups — exactly the
``applyInPandas`` contract: the daily-count relation (groups x T rows)
is one zero-filled hash aggregate, then one grouped numpy kernel per
event type. 10^6 tracked entities at 10^12 events is still (entities x
T) kernel rows — the aggregate, not the corpus, is the kernel input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "event_type string, start_day date, end_day date, "
    "n_days long, weight double"
)


def _daily_relation(
    events: DataFrame, ts_col: str, group_col: str
) -> DataFrame:
    """Zero-filled (grp, day, r, d): per-group daily counts over the
    full [min_day, max_day] calendar, with d = total daily events."""
    days = events.select(
        F.col(group_col).alias("grp"),
        F.to_date(F.col(ts_col)).alias("day"),
    )
    per = days.groupBy("grp", "day").agg(F.count(F.lit(1)).alias("r"))
    span = days.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    grid = days.select("grp").distinct().crossJoin(cal)
    filled = grid.join(per, ["grp", "day"], "left").select(
        "grp", "day", F.coalesce("r", F.lit(0)).alias("r")
    )
    tot = filled.groupBy("day").agg(F.sum("r").alias("d"))
    return filled.join(tot, "day").select("grp", "day", "r", "d")


def kleinberg_bursts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    s: float = 2.0,
    gamma: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """(event_type, start_day, end_day, n_days, weight): maximal burst
    intervals of the optimal 2-state sequence per group, ordered by
    (event_type, start_day); weight = sum of per-day fit savings."""
    rel = _daily_relation(events, ts_col, group_col)
    stats = rel.groupBy("grp").agg(
        F.sum("r").alias("r_tot"), F.sum("d").alias("d_tot")
    )
    joined = rel.join(stats, "grp")

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        r = pdf["r"].to_numpy(dtype=np.float64)
        d = pdf["d"].to_numpy(dtype=np.float64)
        p0 = float(pdf["r_tot"].iloc[0]) / float(pdf["d_tot"].iloc[0])
        p1 = min(0.99, s * p0)
        T = len(pdf)
        tr = gamma * np.log(float(T))
        fit0 = -(r * np.log(p0) + (d - r) * np.log(1.0 - p0))
        fit1 = -(r * np.log(p1) + (d - r) * np.log(1.0 - p1))
        fwd = np.zeros((T, 2))
        fwd[0, 0] = fit0[0]
        fwd[0, 1] = tr + fit1[0]
        for t in range(1, T):
            fwd[t, 0] = fit0[t] + min(fwd[t - 1, 0], fwd[t - 1, 1])
            fwd[t, 1] = fit1[t] + min(fwd[t - 1, 0] + tr, fwd[t - 1, 1])
        bwd = np.zeros((T, 2))
        for t in range(T - 2, -1, -1):
            bwd[t, 0] = min(
                fit0[t + 1] + bwd[t + 1, 0], tr + fit1[t + 1] + bwd[t + 1, 1]
            )
            bwd[t, 1] = min(
                fit0[t + 1] + bwd[t + 1, 0], fit1[t + 1] + bwd[t + 1, 1]
            )
        state = (fwd[:, 0] + bwd[:, 0] > fwd[:, 1] + bwd[:, 1]).astype(int)
        out = []
        start = None
        for t in range(T + 1):
            in_burst = t < T and state[t] == 1
            if in_burst and start is None:
                start = t
            elif not in_burst and start is not None:
                saving = float(np.sum(fit0[start:t] - fit1[start:t]))
                out.append(
                    (
                        pdf["grp"].iloc[0],
                        pdf["day"].iloc[start],
                        pdf["day"].iloc[t - 1],
                        t - start,
                        round(saving, round_digits),
                    )
                )
                start = None
        return pd.DataFrame(
            out,
            columns=["event_type", "start_day", "end_day", "n_days",
                     "weight"],
        )

    return (
        joined.groupBy("grp")
        .applyInPandas(_kernel, _OUT_SCHEMA)
        .orderBy("event_type", "start_day")
    )
