"""Hoover (Robin Hood) index — Hoover 1936: the share of total mass
that would have to move to equalize everyone, H = sum|n*x_i - X| /
(2*n*X). The L1 inequality measure beside the repo's Gini (L381
family): Gini weighs every pairwise gap, Hoover just the
transfer volume — they disagree on middle-heavy distributions,
which is why both ship.

Exact: numerator and denominator are integers; reported as
(h_num, h_den) plus ppm floor.

100-TB shape: per-key totals are one combiner aggregate; the sum
closes on the bounded key table with pure integer arithmetic."""

from __future__ import annotations

import pandas as pd


def hoover_index(values: list[int]) -> pd.DataFrame:
    """(n, total, h_num, h_den, hoover_ppm) over non-negative
    integer masses."""
    n = len(values)
    X = sum(values)
    num = sum(abs(n * x - X) for x in values)
    den = 2 * n * X
    ppm = 1_000_000 * num // den if den else 0
    return pd.DataFrame(
        {
            "n": [n],
            "total": [X],
            "h_num": [num],
            "h_den": [den],
            "hoover_ppm": [ppm],
        }
    ).astype("int64")
