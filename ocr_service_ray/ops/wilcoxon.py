"""Exact Wilcoxon signed-rank test — Wilcoxon 1945, with the EXACT
null distribution (no normal approximation): the W+ statistic's
distribution is the coefficient list of prod_r (1 + x^r), an
integer polynomial DP, so the p-value is a rational over 2^n. The
magnitude-aware upgrade of the sign test (ops/signtest.py): it
weighs HOW Big each day-over-day move was, not just its sign.

Determinism contract (ties in |delta| broken by period order —
a documented divergence from statistical midranks, chosen so the
rank assignment is a pure deterministic sort):
  drop zero deltas; rank |delta| ascending with (|d|, idx) ties;
  W+ = sum of ranks of positive deltas; k = min(W+, n(n+1)/2 - W+);
  p_num = min(2 * sum_{w<=k} count[w], 2^n), p_den = 2^n where
  count = coefficients of prod_{r=1..n} (1 + x^r).

100-TB shape: per-period sums are one combiner aggregate; the
O(n^2 * n) polynomial close is driver arithmetic. The oracle
carries the coefficient list through a recursive CTE over r."""

from __future__ import annotations

import pandas as pd


def wilcoxon_exact(deltas: list[int]) -> pd.DataFrame:
    """(n, w_plus, w_max, p_num, p_den) for ordered deltas."""
    nz = [(abs(d), i, d > 0) for i, d in enumerate(deltas) if d != 0]
    nz.sort()
    n = len(nz)
    w_plus = sum(
        rank for rank, (_, _, pos) in enumerate(nz, 1) if pos
    )
    w_max = n * (n + 1) // 2
    den = 2**n
    if n == 0:
        num = den
    else:
        coef = [1]
        for r in range(1, n + 1):
            new = coef + [0] * r
            for w, c in enumerate(coef):
                new[w + r] += c
            coef = new
        k = min(w_plus, w_max - w_plus)
        num = min(2 * sum(coef[: k + 1]), den)
    return pd.DataFrame(
        {
            "n": [n],
            "w_plus": [w_plus],
            "w_max": [w_max],
            "p_num": [num],
            "p_den": [den],
        }
    ).astype("int64")
