"""Learned-index segmentation — the shrinking-cone algorithm of
FITing-Tree (Galakatos et al. 2019) / PGM-index (Ferragina &
Vinciguerra 2020): stream the sorted key -> rank curve keeping the
interval of slopes that keep every point within +-eps of a single
linear model; when the interval empties, close the segment. The
segment count IS the size of a learned index with error bound eps —
the modern B-tree-vs-learned-index sizing audit.

Exactness: slope bounds are RATIONALS (dy +- eps over dx, dx > 0
since keys strictly increase); all comparisons are integer
cross-multiplications (engine: Fraction; oracle: BIGINT num/den
pairs carried through a recursive CTE). No floats anywhere.

Contract: per key group, points (key_i, i) over the first ``cap``
sorted ids, eps fixed; greedy left-to-right cone; output per group
(n_points, n_segments).

100-TB shape: one bucketed key shuffle co-locates each group; the
cone close is linear per group."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd


def cone_segments(xs: list[int], eps: int = 2) -> int:
    """Number of eps-bounded linear segments covering (x_i, i)."""
    n = len(xs)
    if n == 0:
        return 0
    seg = 1
    x0, y0 = xs[0], 0
    lo, hi = None, None  # open cone
    for i in range(1, n):
        x, y = xs[i], i
        dx = x - x0
        nlo = Fraction(y - y0 - eps, dx)
        nhi = Fraction(y - y0 + eps, dx)
        clo = nlo if lo is None else max(lo, nlo)
        chi = nhi if hi is None else min(hi, nhi)
        if clo > chi:
            seg += 1
            x0, y0 = x, y
            lo, hi = None, None
        else:
            lo, hi = clo, chi
    return seg


def learned_index_segments(
    ds, key_col: str, id_col: str, cap: int = 32, eps: int = 2
) -> pd.DataFrame:
    """Per-key (n_points, n_segments) of the shrinking-cone
    segmentation over the first ``cap`` sorted ids."""
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy(dtype=np.int64))[:cap]
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_points": [len(ids)],
                "n_segments": [cone_segments([int(x) for x in ids], eps)],
            }
        )

    out = (
        bucketed_map_groups(ds, [key_col], fold)
        .to_pandas()
        .sort_values(key_col)
        .reset_index(drop=True)
    )
    out["n_points"] = out["n_points"].astype("int64")
    out["n_segments"] = out["n_segments"].astype("int64")
    return out
