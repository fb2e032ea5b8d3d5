"""Sort-Tile-Recursive R-tree packing — Leutenegger, Lopez & Edgington
1997: the standard bulk-load for spatial indexes. Points are sorted
by x, cut into vertical slabs of S*B points (S = ceil(sqrt(#leaves)),
B = leaf capacity), each slab sorted by y and cut into leaves of B —
producing near-square leaf MBRs whose footprint stats drive spatial
pruning, exactly like the curve layouts (ops/zorder.py /
ops/hilbert.py) drive min/max pruning.

Determinism contract (oracle-replayed with window functions):
  rank_x = dense 0-based rank by (x, id); slab = rank_x // (S*B)
  rank_y = 0-based rank by (y, id) within slab
  leaf_id = slab * S + rank_y // B
Reported per leaf: n_pts, MBR min/max and bbox area (closed boxes,
+1 convention as in ops/rectunion.py).

100-TB shape: the scatter is the per-key combiner output; the
assignment is two sorts closed on the bounded table (a distributed
build would range-partition by x then by y inside partitions — the
same two-level sort this op's contract encodes)."""

from __future__ import annotations

import math

import pandas as pd


def str_pack_stats(
    points: pd.DataFrame, id_col: str, x_col: str, y_col: str, capacity: int = 64
) -> pd.DataFrame:
    """Per-leaf MBR stats of the STR packing. Returns ``(leaf_id,
    n_pts, min_x, max_x, min_y, max_y, bbox_area)`` sorted."""
    pts = points[[id_col, x_col, y_col]].copy()
    pts.columns = ["id", "x", "y"]
    pts = pts.astype("int64")
    n = len(pts)
    if n == 0:
        return pd.DataFrame(
            columns=[
                "leaf_id", "n_pts", "min_x", "max_x", "min_y", "max_y",
                "bbox_area",
            ]
        ).astype("int64")
    n_leaves = math.ceil(n / capacity)
    S = math.ceil(math.sqrt(n_leaves))
    pts = pts.sort_values(["x", "id"], kind="stable").reset_index(drop=True)
    pts["slab"] = pts.index // (S * capacity)
    pts = pts.sort_values(["slab", "y", "id"], kind="stable").reset_index(drop=True)
    pts["rank_y"] = pts.groupby("slab").cumcount()
    pts["leaf_id"] = pts["slab"] * S + pts["rank_y"] // capacity
    out = (
        pts.groupby("leaf_id")
        .agg(
            n_pts=("id", "count"),
            min_x=("x", "min"),
            max_x=("x", "max"),
            min_y=("y", "min"),
            max_y=("y", "max"),
        )
        .reset_index()
        .sort_values("leaf_id")
        .reset_index(drop=True)
    )
    out["bbox_area"] = (out["max_x"] - out["min_x"] + 1) * (
        out["max_y"] - out["min_y"] + 1
    )
    return out.astype("int64")
