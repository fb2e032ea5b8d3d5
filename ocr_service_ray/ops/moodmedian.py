"""Mood's median test — Brown & Mood 1951, with the EXACT
hypergeometric tail (Fisher form): do two groups sit above the
pooled median equally often? Counting above/below the grand median
reduces the comparison to a 2x2 whose null is hypergeometric —
an exact rational on a bounded panel, no chi-square approximation.
Completes the exact-test family (sign, Wilcoxon, McNemar, Cochran).

Contract (bounded panel, deterministic):
  pooled median = lower median of all values (sorted, index
  (N-1)//2); x = #group-1 values STRICTLY above it, n = #values
  strictly above overall, K = |group 1|, N = total;
  one-sided upper tail p = sum_{i>=x} C(K,i) C(N-K,n-i) / C(N,n)
  reported as (p_num, p_den).

100-TB shape: per-period sums are a combiner aggregate; the tail is
O(N) driver arithmetic over exact binomials."""

from __future__ import annotations

from math import comb

import pandas as pd


def mood_median_test(values1: list[int], values2: list[int]) -> pd.DataFrame:
    """(n1, n2, median_cents, x_above_1, n_above, p_num, p_den)."""
    allv = sorted(values1 + values2)
    N = len(allv)
    med = allv[(N - 1) // 2] if N else 0
    x = sum(1 for v in values1 if v > med)
    n = sum(1 for v in allv if v > med)
    K = len(values1)
    den = comb(N, n) if N else 1
    num = sum(
        comb(K, i) * comb(N - K, n - i)
        for i in range(x, min(K, n) + 1)
    ) if N else 1
    return pd.DataFrame(
        {
            "n1": [K],
            "n2": [len(values2)],
            "median_cents": [med],
            "x_above_1": [x],
            "n_above": [n],
            "p_num": [num],
            "p_den": [den],
        }
    ).astype("int64")
