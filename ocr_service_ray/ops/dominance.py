"""Dominance counting — per-point strict-dominance depth via a
Fenwick-tree sweep (the O(n log n) 2-D dominance counter; the
multi-metric ranking primitive behind Pareto depth / skyline layers
that a quadratic all-pairs comparison cannot afford at scale).

A point q strictly dominates p iff x_q < x_p AND y_q < y_p (both
metrics strictly better). Sweeping points in (x, y, id) order while
Fenwick-accumulating compressed y-ranks counts each point's
dominators exactly; x-ties are held out of the tree until their
whole x-group is processed (strictness), and the oracle is the
O(n²) self-join count — an independent algorithm, so parity is a
real cross-check.

100-TB shape: the point table here is the per-user combiner output
(|users|-bounded close, the hull/mincut discipline); the exact
big-data variant would range-partition on x and carry per-partition
Fenwick summaries — semantics unchanged."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class _Fenwick:
    def __init__(self, n: int):
        self.n = n
        self.t = np.zeros(n + 1, dtype=np.int64)

    def add(self, i: int):
        i += 1
        while i <= self.n:
            self.t[i] += 1
            i += i & (-i)

    def prefix(self, i: int) -> int:  # count of ranks < i
        s = 0
        while i > 0:
            s += int(self.t[i])
            i -= i & (-i)
        return s


def dominance_depth(points: pd.DataFrame, id_col: str, x_col: str, y_col: str) -> pd.DataFrame:
    """Per-point strict dominator count over an (id, x, y) frame.
    Returns ``(id_col, x, y, dominated_by)`` sorted by id."""
    df = points[[id_col, x_col, y_col]].copy()
    ys = np.sort(df[y_col].unique())
    yrank = {v: i for i, v in enumerate(ys)}
    fw = _Fenwick(len(ys))
    out = {}
    ordered = df.sort_values([x_col, y_col, id_col]).itertuples()
    pending: list = []
    last_x = None
    for row in ordered:
        x = getattr(row, x_col)
        if last_x is not None and x != last_x:
            for yr in pending:
                fw.add(yr)
            pending = []
        last_x = x
        yr = yrank[getattr(row, y_col)]
        out[getattr(row, id_col)] = fw.prefix(yr)  # strictly smaller y
        pending.append(yr)
    res = df.sort_values(id_col).reset_index(drop=True)
    res["dominated_by"] = [out[i] for i in res[id_col]]
    res.columns = [id_col, "x", "y", "dominated_by"]
    for c in ("x", "y", "dominated_by"):
        res[c] = res[c].astype("int64")
    return res


def user_dominance(ds, user_col: str, value_col: str) -> pd.DataFrame:
    """Dominance depth of the per-user (total cents, n events)
    scatter — one combiner scan, Fenwick close on the bounded user
    table."""
    from ocr_service_ray.ops.agg import grouped_agg

    def cents(b: pa.Table) -> pa.Table:
        c = np.floor(
            b[value_col].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({user_col: b[user_col], "c": pa.array(c)})

    pts = grouped_agg(
        ds.map_batches(cents, batch_format="pyarrow"),
        [user_col],
        {"x": ("c", "sum"), "y": (None, "count")},
    ).to_pandas()
    return dominance_depth(pts, user_col, "x", "y")
