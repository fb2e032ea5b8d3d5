"""Kaplan-Meier product-limit survival estimator, SQL-replayably
quantized.

One combiner value-counts pass (`ops/agg.grouped_agg` on (t, d))
reduces per-subject (duration, event-indicator) rows to the
|distinct durations|-bounded sufficient statistic; the risk set
N(t) = #subjects with T >= t is a reversed cumulative sum over that
small driver-side table. The survival curve is the INTEGER recurrence

    s_0 = 1_000_000
    s_k = (s_{k-1} * (N(t_k) - d_k)) // N(t_k)

over event times t_k (those with d_k >= 1 deaths): each product step
floors to ppm — deterministic, layout-invariant, overflow-safe
(s <= 1e6 so the product fits int64 up to N ~ 9e12 subjects at risk),
and exactly replayable by a recursive CTE (DuckDB `//`). Censored
subjects (d = 0) stay in the risk set through their own time and
leave after it — standard KM right-censoring. Raw rows never reach
the driver; only the (t, d)-value-counts table does.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from ocr_service_ray.ops.agg import grouped_agg

PPM = 1_000_000


def kaplan_meier(ds, t_col: str, d_col: str) -> pd.DataFrame:
    """KM over a Dataset of per-subject rows (t_col: int duration,
    d_col: 1 = event observed, 0 = right-censored).

    Returns one row per event time: (t, n_risk, n_events, surv_ppm)
    with surv_ppm the floored-ppm product-limit estimate after t.
    """
    vc = grouped_agg(ds, [t_col, d_col], {"n": (None, "count")}).to_pandas()
    if vc.empty:
        return pd.DataFrame(
            {
                c: pd.Series([], dtype="int64")
                for c in ("t", "n_risk", "n_events", "surv_ppm")
            }
        )
    per_t = vc.groupby(t_col, as_index=False).agg(n_all=("n", "sum"))
    deaths = (
        vc[vc[d_col] == 1]
        .groupby(t_col, as_index=False)
        .agg(d=("n", "sum"))
    )
    tab = per_t.merge(deaths, on=t_col, how="left")
    tab["d"] = tab["d"].fillna(0).astype(np.int64)
    tab = tab.sort_values(t_col).reset_index(drop=True)
    total = int(tab["n_all"].sum())
    cum_before = (
        tab["n_all"].cumsum().shift(fill_value=0).astype(np.int64)
    )
    tab["n_risk"] = total - cum_before
    ev = tab[tab["d"] > 0].reset_index(drop=True)
    s = PPM
    surv = []
    for nr, d in zip(ev["n_risk"].tolist(), ev["d"].tolist()):
        s = (s * (int(nr) - int(d))) // int(nr)
        surv.append(s)
    return pd.DataFrame(
        {
            "t": ev[t_col].astype("int64"),
            "n_risk": ev["n_risk"].astype("int64"),
            "n_events": ev["d"].astype("int64"),
            "surv_ppm": pd.array(surv, dtype="int64"),
        }
    )
