"""Banzhaf power index — Banzhaf 1965: a player's voting power is
the number of coalitions it SWINGS (w(S) below quota, w(S)+w_i at or
above). The counting sibling of the Shapley value (ops/shapley.py
weights ordered marginals; Banzhaf counts unordered swings) — the
two genuinely disagree on weighted games, which is the point of
having both in the audit toolbox.

Exact-integer contract (oracle-replayed by mask enumeration):
  B_i      = #{S subset of P minus i : w(S) < q and w(S) + w_i >= q}
  power_ppm = 10^6 * B_i // sum_j B_j   (0 when no swings exist)

100-TB shape: weights are a bounded combiner aggregate; the 2^n
lattice closes on the driver (n = |regions|, fixed)."""

from __future__ import annotations

import pandas as pd


def banzhaf(weights: dict[int, int], quota: int) -> pd.DataFrame:
    """Swing counts + power shares for a weighted voting game."""
    players = sorted(weights)
    n = len(players)
    counts = {p: 0 for p in players}
    for mask in range(1 << n):
        wsum = sum(weights[players[i]] for i in range(n) if mask >> i & 1)
        if wsum >= quota:
            continue
        for i, p in enumerate(players):
            if not (mask >> i & 1) and wsum + weights[p] >= quota:
                counts[p] += 1
    total = sum(counts.values())
    rows = [
        (
            p,
            weights[p],
            quota,
            counts[p],
            1_000_000 * counts[p] // total if total else 0,
        )
        for p in players
    ]
    return pd.DataFrame(
        rows, columns=["player", "weight", "quota", "swings", "power_ppm"]
    ).astype("int64")
