"""Optimal binary search tree — Knuth 1971 (CLRS 15.5): given access
frequencies for sorted keys, the DP over intervals finds the tree
minimizing total weighted depth — the exact layout for a static
dictionary/index hot path (vs the balanced tree a naive build
gives). Integer weights make every DP cell exact; root ties break
to the smallest index, so the tree itself is deterministic.

  cost(i,j) = min_r cost(i,r-1) + cost(r+1,j) + W(i,j)
  (depth-1 convention: W added per level below the root's own visit;
  total cost = expected comparisons * total weight)

Oracle: the DP is replayed interval-by-interval as a chained-CTE
ladder (one CTE per interval length — the L1-segmentation
discipline), no recursion needed.

100-TB shape: frequencies are one combiner aggregate capped to the
top-n keys; the O(n^3) close runs on the bounded table."""

from __future__ import annotations

import pandas as pd


def obst_cost(weights: list[int]) -> tuple[int, int, int]:
    """(opt_cost, root_index0, balanced_cost) for sorted-key weights.

    opt_cost = sum over keys of weight * depth (root depth 1);
    balanced_cost = same metric for the deterministic
    median-rooted (lower median) balanced tree."""
    n = len(weights)
    if n == 0:
        return 0, -1, 0
    W = [[0] * (n + 1) for _ in range(n + 1)]
    for i in range(n):
        acc = 0
        for j in range(i, n):
            acc += weights[j]
            W[i][j + 1] = acc
    INF = 1 << 62
    cost = [[0] * (n + 1) for _ in range(n + 1)]
    root = [[-1] * (n + 1) for _ in range(n + 1)]
    for length in range(1, n + 1):
        for i in range(0, n - length + 1):
            j = i + length
            best, br = INF, -1
            for r in range(i, j):
                c = cost[i][r] + cost[r + 1][j] + W[i][j]
                if c < best:
                    best, br = c, r
            cost[i][j] = best
            root[i][j] = br

    def balanced(i: int, j: int, depth: int) -> int:
        if i >= j:
            return 0
        m = (i + j - 1) // 2
        return (
            weights[m] * depth
            + balanced(i, m, depth + 1)
            + balanced(m + 1, j, depth + 1)
        )

    return cost[0][n], root[0][n], balanced(0, n, 1)


def obst_report(freqs: pd.DataFrame, key_col: str, w_col: str, top_n: int = 12) -> pd.DataFrame:
    """One-row report over the ``top_n`` keys by (weight desc, key
    asc), then key-sorted: (n_keys, total_weight, opt_cost,
    balanced_cost, gain_ppm)."""
    top = freqs.sort_values(
        [w_col, key_col], ascending=[False, True]
    ).head(top_n)
    top = top.sort_values(key_col).reset_index(drop=True)
    w = [int(x) for x in top[w_col]]
    opt, _, bal = obst_cost(w)
    gain = 1_000_000 * (bal - opt) // bal if bal else 0
    return pd.DataFrame(
        {
            "n_keys": [len(w)],
            "total_weight": [sum(w)],
            "opt_cost": [opt],
            "balanced_cost": [bal],
            "gain_ppm": [gain],
        }
    ).astype("int64")
