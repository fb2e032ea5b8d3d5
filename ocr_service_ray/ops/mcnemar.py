"""Exact McNemar test — McNemar 1947, exact binomial form: did the
paired binary outcome CHANGE symmetrically? Only the discordant
pairs carry information: b (yes->no) vs c (no->yes), and under the
null each discordant pair is a fair coin, so
  p_num = min(2 * sum_{i<=min(b,c)} C(b+c, i), 2^(b+c)),
  p_den = 2^(b+c)
— an exact rational, the paired sibling of ops/signtest.py. The
A/B-release audit: did the same users flip behaviour after the
split point?

100-TB shape: the 2x2 concordance table is one combiner aggregate
over per-key period flags; the tail is O(b+c) driver arithmetic."""

from __future__ import annotations

from math import comb

import pandas as pd


def mcnemar_exact(n11: int, n10: int, n01: int, n00: int) -> pd.DataFrame:
    """(n11, n10, n01, n00, p_num, p_den) for a paired 2x2 table
    (first index = period-1 flag, second = period-2 flag)."""
    b, c = n10, n01
    n = b + c
    den = 2**n
    if n == 0:
        num = den
    else:
        k = min(b, c)
        num = min(2 * sum(comb(n, i) for i in range(k + 1)), den)
    return pd.DataFrame(
        {
            "n11": [n11],
            "n10": [n10],
            "n01": [n01],
            "n00": [n00],
            "p_num": [num],
            "p_den": [den],
        }
    ).astype("int64")
