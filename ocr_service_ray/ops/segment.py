"""Optimal 1-D k-segmentation under L1 cost — exact changepoint
detection by dynamic programming (Bellman 1961 segmented least
squares, in the L1 form whose per-segment cost is an integer:
Σ|v_t − lower-median| — no float ever appears).

The data-parallel phase is the per-period value combiner (daily sums
— a |periods|-bounded table); the O(k·n²) DP closes on the driver
(the dtw/huffman bounded-close discipline: n is a period count).
Determinism contract the oracle replays: lower median (sorted element
at position ceil(m/2)), and argmin ties prefer the SMALLEST segment
start, making the boundary sequence — not just the total cost —
engine-exact.

Use: piecewise-constant trend fitting / changepoint audit over
metric series (the k-segment generalization of cusum_change_point's
single split)."""

from __future__ import annotations

import numpy as np
import pandas as pd

_INF = 1 << 60


def _seg_costs(v: np.ndarray):
    """cost[i][j], med[i][j] for 0-based inclusive windows — exact
    integer L1 distance to the window's lower median."""
    n = len(v)
    cost = np.zeros((n, n), dtype=np.int64)
    med = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(i, n):
            w = np.sort(v[i : j + 1])
            m = len(w)
            h = (m + 1) // 2  # 1-based lower-median position
            md = int(w[h - 1])
            med[i][j] = md
            cost[i][j] = int(np.abs(w - md).sum())
    return cost, med


def l1_k_segmentation(series: pd.DataFrame, value_col: str, k: int) -> pd.DataFrame:
    """Optimal split of the (already period-ordered) series into
    exactly ``k`` contiguous segments minimizing total Σ|v − seg
    lower-median|. Returns one row per segment:
    ``(seg_idx, start_i, end_i, n_periods, seg_med, seg_cost,
    total_cost)`` with 1-based period indices."""
    v = series[value_col].to_numpy(np.int64)
    n = len(v)
    if n < k:
        raise ValueError(f"need >= {k} periods, got {n}")
    cost, med = _seg_costs(v)
    # dp[s][j]: best cost of first j+1 periods in s+1 segments;
    # arg[s][j]: 0-based start of the LAST segment (smallest on tie)
    dp = np.full((k, n), _INF, dtype=np.int64)
    arg = np.zeros((k, n), dtype=np.int64)
    dp[0] = cost[0]
    for s in range(1, k):
        for j in range(n):
            best, bi = _INF, 0
            for i in range(s, j + 1):  # last segment = [i..j]
                c = dp[s - 1][i - 1] + cost[i][j]
                if c < best:  # strict: ties keep the smaller i
                    best, bi = c, i
            dp[s][j] = best
            arg[s][j] = bi
    total = int(dp[k - 1][n - 1])
    bounds = []
    j = n - 1
    for s in range(k - 1, -1, -1):
        i = int(arg[s][j]) if s > 0 else 0
        bounds.append((i, j))
        j = i - 1
    bounds.reverse()
    rows = [
        {
            "seg_idx": s + 1,
            "start_i": i + 1,
            "end_i": j + 1,
            "n_periods": j - i + 1,
            "seg_med": int(med[i][j]),
            "seg_cost": int(cost[i][j]),
            "total_cost": total,
        }
        for s, (i, j) in enumerate(bounds)
    ]
    out = pd.DataFrame(rows)
    return out.astype("int64")
