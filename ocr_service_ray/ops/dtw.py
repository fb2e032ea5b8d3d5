"""Dynamic time warping between grouped time series — exact integer
DP over combiner-built series (Sakoe & Chiba 1978; the standard
elastic-alignment distance for series of different phase/speed).

The data-parallel phase is ONE grouped count/sum combiner building
the per-key ordered series — a |keys|·|periods|-bounded table; the
O(n·m) alignment DP closes on the driver per key PAIR (the bounded-
close discipline: series length is a period count, never a row
count). dtw[i][j] = |a_i - b_j| + min(dtw[i-1][j-1], dtw[i-1][j],
dtw[i][j-1]) with dtw[0][0] = 0 and out-of-range = ∞ — all integers,
so the oracle replays the DP cell by cell in a list-carrying
recursive CTE and matches exactly.

100-TB shape: raw events never shuffle — the combiner moves
(key, period, count) partials only. A banded (Sakoe-Chiba window)
variant bounds the close to O(n·w) when periods grow long; the full
DP here is the exact reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

INF = 1 << 60


def dtw_cost(a: np.ndarray, b: np.ndarray) -> int:
    """Exact integer DTW distance between two int series (L1 cost)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0
    prev = np.full(m + 1, INF, dtype=np.int64)
    prev[0] = 0  # dtw(0,0); dtw(0,j>0) stays INF
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF, dtype=np.int64)
        for j in range(1, m + 1):
            best = min(prev[j - 1], prev[j], cur[j - 1])
            if best < INF:
                cur[j] = abs(int(a[i - 1]) - int(b[j - 1])) + best
        prev = cur
    return int(prev[m])


def grouped_series_dtw(
    ds, key_col: str, period_col: str, value_col: str | None = None
) -> pd.DataFrame:
    """All-pairs DTW over per-key period series built by one combiner
    scan (count per (key, period) when ``value_col`` is None, else
    sum). Returns one row per unordered key pair (a < b):
    ``(key_a, key_b, n_a, n_b, dtw_cost)``."""
    from ocr_service_ray.ops.agg import grouped_agg

    spec = (
        {"v": (None, "count")}
        if value_col is None
        else {"v": (value_col, "sum")}
    )
    tab = grouped_agg(ds, [key_col, period_col], spec).to_pandas()
    series = {
        k: g.sort_values(period_col)["v"].to_numpy(np.int64)
        for k, g in tab.groupby(key_col)
    }
    keys = sorted(series)
    rows = []
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            rows.append(
                {
                    "key_a": ka,
                    "key_b": kb,
                    "n_a": len(series[ka]),
                    "n_b": len(series[kb]),
                    "dtw_cost": dtw_cost(series[ka], series[kb]),
                }
            )
    out = pd.DataFrame(rows)
    for c in ("n_a", "n_b", "dtw_cost"):
        out[c] = out[c].astype("int64")
    return out
