"""Exact Wald-Wolfowitz runs distribution — Wald & Wolfowitz 1940,
the exact combinatorial form: among all C(n, n1) arrangements of n1
pluses and n2 minuses, the number with exactly R runs has the
closed binomial forms
  N(2k)   = 2 C(n1-1, k-1) C(n2-1, k-1)
  N(2k+1) =   C(n1-1, k-1) C(n2-1, k) + C(n1-1, k) C(n2-1, k-1)
so the ONE-SIDED lower-tail p (too few runs = clustering) is an
exact rational: p = sum_{r<=R_obs} N(r) / C(n, n1). Completes
runs_test_daily (which reports R plus exact moments) with the exact
tail — no normal approximation.

Contract: signs of day-over-day deltas, zeros dropped; degenerate
n1 = 0 or n2 = 0 => p = 1.

100-TB shape: the daily combiner is the data phase; the tail is
O(R) driver arithmetic over exact binomials."""

from __future__ import annotations

from math import comb

import pandas as pd


def _n_runs(signs: list[int]) -> int:
    r = 0
    prev = 0
    for s in signs:
        if s != prev:
            r += 1
            prev = s
    return r


def runs_exact(deltas: list[int]) -> pd.DataFrame:
    """(n_pos, n_neg, r_obs, p_num, p_den) for ordered deltas."""
    signs = [1 if d > 0 else -1 for d in deltas if d != 0]
    n1 = sum(1 for s in signs if s == 1)
    n2 = len(signs) - n1
    n = n1 + n2
    r_obs = _n_runs(signs)
    if n1 == 0 or n2 == 0:
        return pd.DataFrame(
            {
                "n_pos": [n1],
                "n_neg": [n2],
                "r_obs": [r_obs],
                "p_num": [1],
                "p_den": [1],
            }
        ).astype("int64")
    den = comb(n, n1)
    num = 0
    for r in range(2, r_obs + 1):
        if r % 2 == 0:
            k = r // 2
            num += 2 * comb(n1 - 1, k - 1) * comb(n2 - 1, k - 1)
        else:
            k = (r - 1) // 2
            num += comb(n1 - 1, k - 1) * comb(n2 - 1, k) + comb(
                n1 - 1, k
            ) * comb(n2 - 1, k - 1)
    return pd.DataFrame(
        {
            "n_pos": [n1],
            "n_neg": [n2],
            "r_obs": [r_obs],
            "p_num": [num],
            "p_den": [den],
        }
    ).astype("int64")
