"""Lorenz curve — Lorenz 1905: cumulative share of total mass held
by the bottom k/10 of holders, the curve under which Gini is the
area gap and on which Hoover is the max vertical gap and Palma a
two-point ratio. Completing the inequality family with the full
curve itself, in exact integers.

Contract: holders ranked ascending by (value, key); cut k keeps the
bottom floor(k*n/10); share_ppm = 10^6 * S_k // X. Row k=10 is
always (n, X, 10^6) — a built-in checksum.

100-TB shape: per-key totals are one combiner aggregate; cuts close
on the bounded key table (value-counts quantile combiner at corpus
scale)."""

from __future__ import annotations

import pandas as pd


def lorenz_deciles(pairs: list[tuple[int, int]]) -> pd.DataFrame:
    """``pairs`` = (key, value). Returns rows k = 1..10:
    (decile, n_bottom, mass_bottom, share_ppm)."""
    ordered = sorted((v, k) for k, v in pairs)
    n = len(ordered)
    X = sum(v for v, _ in ordered)
    pref = [0]
    for v, _ in ordered:
        pref.append(pref[-1] + v)
    rows = []
    for k in range(1, 11):
        nb = (k * n) // 10
        mass = pref[nb]
        rows.append(
            (k, nb, mass, 1_000_000 * mass // X if X else 0)
        )
    return pd.DataFrame(
        rows, columns=["decile", "n_bottom", "mass_bottom", "share_ppm"]
    ).astype("int64")
