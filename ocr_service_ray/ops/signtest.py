"""Exact sign test — the oldest nonparametric test (Arbuthnott
1710): are day-over-day changes symmetrically up/down? The p-value
is an exact binomial tail — a RATIONAL with denominator 2^n — so no
normal approximation and no floats anywhere (the exact counterpart
to the repo's z-test family).

Contract: deltas of consecutive per-period sums in period order;
zeros dropped; n = n_pos + n_neg; k = min(n_pos, n_neg);
  p_num = min(2 * sum_{i<=k} C(n, i), 2^n),  p_den = 2^n
(two-sided, capped at 1). The oracle rebuilds Pascal's triangle row
by row as a list-carrying recursive CTE and sums the same tail.

100-TB shape: per-period sums are one combiner aggregate; the tail
close is O(n) driver arithmetic."""

from __future__ import annotations

from math import comb

import pandas as pd


def sign_test(deltas: list[int]) -> pd.DataFrame:
    """(n, n_pos, n_neg, n_zero, p_num, p_den) for a delta list."""
    n_pos = sum(1 for d in deltas if d > 0)
    n_neg = sum(1 for d in deltas if d < 0)
    n_zero = sum(1 for d in deltas if d == 0)
    n = n_pos + n_neg
    den = 2**n
    if n == 0:
        num = den
    else:
        k = min(n_pos, n_neg)
        num = min(2 * sum(comb(n, i) for i in range(k + 1)), den)
    return pd.DataFrame(
        {
            "n": [n],
            "n_pos": [n_pos],
            "n_neg": [n_neg],
            "n_zero": [n_zero],
            "p_num": [num],
            "p_den": [den],
        }
    ).astype("int64")
