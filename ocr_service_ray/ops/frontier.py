"""Distributed Pareto frontier (skyline) — rows not dominated by any
other row.

Row s dominates row r when s is better-or-equal on every criterion
and strictly better on at least one (ties on all criteria dominate
neither way, so exact duplicates all survive — SQL ``NOT EXISTS``
semantics).

Scale shape: dominance is transitive, so the global frontier is a
subset of the union of block-local frontiers. Phase 1 computes the
local frontier inside ``map_batches`` (vectorized sort + group-max
scan, O(n log n) per block); phase 2 re-reduces the union on the
driver with the same kernel. The driver pull is bounded by the sum
of local frontier sizes — for continuous-ish 2-criteria data that is
O(log n) per block in expectation, and the phase-1 filter is what
makes the op viable at 100 TB (raw rows never leave their block).
For pathological inputs where every row is locally non-dominated
(e.g. a perfectly anti-correlated sorted block), phase 2 degrades
toward a full pull — callers with >2 criteria at extreme scale
should pre-bucket on one criterion first.

Implementation is 2-criteria (the common price/quality curation
trade-off); both directions configurable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _frontier_local(df: pd.DataFrame, a_col: str, b_col: str) -> pd.DataFrame:
    """Keep rows not dominated within df. a is minimized, b maximized."""
    if df.empty:
        return df
    # per distinct a: only rows at the group-max b can survive; a
    # group's max-b rows survive iff that max strictly exceeds the
    # running max over all strictly-smaller a values.
    a = df[a_col].to_numpy()
    b = df[b_col].to_numpy()
    order = np.lexsort((-b, a))
    a_s, b_s = a[order], b[order]
    # group boundaries over sorted distinct a
    new_grp = np.empty(len(a_s), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = a_s[1:] != a_s[:-1]
    grp_id = np.cumsum(new_grp) - 1
    # group max b = first element of each group (sorted -b within a)
    gmax = b_s[new_grp][grp_id]
    # running max of gmax over previous groups
    gmax_per_grp = b_s[new_grp]
    prev = np.empty(len(gmax_per_grp))
    prev[0] = -np.inf
    cummax = np.maximum.accumulate(gmax_per_grp)
    prev[1:] = cummax[:-1]
    keep_sorted = (b_s == gmax) & (gmax > prev[grp_id])
    keep = np.zeros(len(df), dtype=bool)
    keep[order] = keep_sorted
    return df[keep]


def pareto_frontier(ds, minimize: str, maximize: str) -> pd.DataFrame:
    """Global skyline of a Dataset: minimize `minimize`, maximize
    `maximize`. Returns the (small) frontier as pandas."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return _frontier_local(b, minimize, maximize)

    reduced = ds.map_batches(local, batch_format="pandas").to_pandas()
    return _frontier_local(reduced, minimize, maximize).reset_index(drop=True)
