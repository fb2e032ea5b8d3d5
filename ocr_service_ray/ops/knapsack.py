"""0/1 knapsack selection — the exact Bellman dynamic program
(Bellman 1957) over integer weights/values: pick the document subset
maximizing total value under a hard token budget. The optimal
counterpart to greedy prefix trimming (token_budget_cap): curation
under a context/TPU-hour budget where the greedy answer is provably
suboptimal.

Determinism contract (the SQL oracle replays DP AND backtrack):
  items sorted by id; dp_i[b] = max(dp_{i-1}[b],
  b >= w_i ? dp_{i-1}[b - w_i] + v_i : skip)
  backtrack from (i=n, b=B): item i selected iff
  dp_i[b] != dp_{i-1}[b]  (ties prefer NOT selecting — deterministic),
  then b -= w_i.

100-TB shape: the candidate set is a bounded filtered projection
(one scan, text never leaves the worker — only (id, weight, value)
partials); the O(|items|·B) DP closes on the driver like the other
bounded-matrix closes (ops/matching.py discipline). |items|·B must
be driver-bounded by contract — cap the candidate filter, not the
corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd


def knapsack_select(items: pd.DataFrame, id_col: str, w_col: str, v_col: str, budget: int) -> pd.DataFrame:
    """Exact 0/1 knapsack over ``items``. Returns one row per item
    (sorted by id): ``(id, weight, value, selected, best_value)``."""
    it = items.sort_values(id_col).reset_index(drop=True)
    n = len(it)
    w = it[w_col].astype(int).to_numpy()
    v = it[v_col].astype(int).to_numpy()
    dp = np.zeros((n + 1, budget + 1), dtype=np.int64)
    for i in range(1, n + 1):
        dp[i] = dp[i - 1]
        wi, vi = w[i - 1], v[i - 1]
        if wi <= budget:
            cand = dp[i - 1, : budget + 1 - wi] + vi
            take = cand > dp[i - 1, wi:]
            dp[i, wi:] = np.where(take, cand, dp[i - 1, wi:])
    sel = np.zeros(n, dtype=np.int64)
    b = budget
    for i in range(n, 0, -1):
        if dp[i, b] != dp[i - 1, b]:
            sel[i - 1] = 1
            b -= w[i - 1]
    out = pd.DataFrame(
        {
            id_col: it[id_col].astype("int64"),
            "weight": w,
            "value": v,
            "selected": sel,
            "best_value": np.full(n, dp[n, budget], dtype=np.int64),
        }
    )
    return out
