"""Cochran's Q — Cochran 1950: do k binary 'treatments' have equal
success rates across matched blocks? The binary sibling of Friedman
(ops for which already exist). All integer:
  Q = (k-1) * (k * sum_t G_t^2 - (sum_t G_t)^2)
      / (k * sum_u L_u - sum_u L_u^2)
reported as (q_num, q_den) — exact rational, no chi-square
approximation applied in-engine (the caller compares to the
chi2_{k-1} tail; the STATISTIC itself is exact).

Contract: blocks = a bounded sorted key prefix; x_{u,t} = 1 iff the
block has >= 1 observation of treatment t; every chosen block
enters the raw formula (constant rows included — documented).

100-TB shape: presence is one distinct-pair combiner; the sums
close on the bounded block x treatment table."""

from __future__ import annotations

import pandas as pd


def cochran_q(presence: pd.DataFrame, block_col: str, treat_col: str, treatments: list) -> pd.DataFrame:
    """(k, n_blocks, q_num, q_den) from a distinct (block,
    treatment) presence table."""
    k = len(treatments)
    blocks = sorted(set(presence[block_col]))
    have = {
        (b, t)
        for b, t in zip(presence[block_col], presence[treat_col])
    }
    G = {t: sum(1 for b in blocks if (b, t) in have) for t in treatments}
    L = {b: sum(1 for t in treatments if (b, t) in have) for b in blocks}
    sg = sum(G.values())
    sg2 = sum(v * v for v in G.values())
    sl = sum(L.values())
    sl2 = sum(v * v for v in L.values())
    q_num = (k - 1) * (k * sg2 - sg * sg)
    q_den = k * sl - sl2
    return pd.DataFrame(
        {
            "k": [k],
            "n_blocks": [len(blocks)],
            "q_num": [q_num],
            "q_den": [q_den],
        }
    ).astype("int64")
