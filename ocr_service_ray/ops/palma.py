"""Palma ratio — Palma 2011 / Cobham-Sumner 2013: top-10% share
over bottom-40% share, the inequality measure that ignores the
stable middle. Exact integer contract (deterministic cuts on the
sorted-ascending value order, ties by key):
  k_top = ceil(n/10), k_bot = floor(4n/10);
  S_top = sum of the k_top largest, S_bot = sum of the k_bot
  smallest (ties resolved by (value, key) order);
  palma = S_top / S_bot reported as (p_num, p_den) plus milli floor.

The tail-focused companion to Gini (pairwise) and Hoover (transfer
volume) — three inequality lenses, three sensitivities.

100-TB shape: per-key totals are one combiner aggregate; cuts and
sums close on the bounded key table (at corpus scale the cuts ride
the existing value-counts quantile combiner instead of a sort)."""

from __future__ import annotations

import math

import pandas as pd


def palma_ratio(pairs: list[tuple[int, int]]) -> pd.DataFrame:
    """``pairs`` = (key, value). Returns (n, k_top, k_bot, s_top,
    s_bot, palma_milli)."""
    n = len(pairs)
    ordered = sorted((v, k) for k, v in pairs)
    k_top = math.ceil(n / 10) if n else 0
    k_bot = (4 * n) // 10
    s_top = sum(v for v, _ in ordered[n - k_top :]) if k_top else 0
    s_bot = sum(v for v, _ in ordered[:k_bot])
    milli = 1000 * s_top // s_bot if s_bot else 0
    return pd.DataFrame(
        {
            "n": [n],
            "k_top": [k_top],
            "k_bot": [k_bot],
            "s_top": [s_top],
            "s_bot": [s_bot],
            "palma_milli": [milli],
        }
    ).astype("int64")
