"""Exact Kendall concordance census — Kendall 1938 with Kendall
1945 tie partitioning: every unordered pair of observations is
exactly one of concordant / discordant / tied-x-only / tied-y-only
/ tied-both, and all five counts are pure integers. Reported raw,
plus tau-a as (C - D) over n(n-1)/2 — no sqrt, so no tau-b float;
callers needing tau-b get all five ingredients exactly. The
bivariate complement of the repo's inversion count and Spearman
moments.

100-TB shape: the (x, y) per-key table is one combiner aggregate;
the pair census closes on the bounded key table with CHUNKED
vectorized comparisons (O(n^2) flops, O(chunk*n) memory)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def kendall_census(xs: np.ndarray, ys: np.ndarray, chunk: int = 512) -> pd.DataFrame:
    x = np.asarray(xs, dtype=np.int64)
    y = np.asarray(ys, dtype=np.int64)
    n = len(x)
    C = D = TX = TY = TB = 0
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        xa = x[i0:i1, None]
        ya = y[i0:i1, None]
        # compare block rows i against all j > i
        sx = np.sign(x[None, :] - xa)
        sy = np.sign(y[None, :] - ya)
        # mask to strictly-upper pairs (j > i)
        jj = np.arange(n)[None, :]
        ii = np.arange(i0, i1)[:, None]
        m = jj > ii
        prod = sx * sy
        C += int(((prod == 1) & m).sum())
        D += int(((prod == -1) & m).sum())
        TB += int(((sx == 0) & (sy == 0) & m).sum())
        TX += int(((sx == 0) & (sy != 0) & m).sum())
        TY += int(((sx != 0) & (sy == 0) & m).sum())
    den = n * (n - 1) // 2
    return pd.DataFrame(
        {
            "n": [n],
            "concordant": [C],
            "discordant": [D],
            "ties_x": [TX],
            "ties_y": [TY],
            "ties_both": [TB],
            "tau_a_num": [C - D],
            "tau_a_den": [den if den else 1],
        }
    ).astype("int64")
