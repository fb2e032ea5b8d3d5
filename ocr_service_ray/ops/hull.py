"""Distributed convex hull — Andrew monotone chain with the
hull-of-hulls combiner (Andrew 1979; hulls are MERGEABLE:
hull(A ∪ B) = hull(hull(A) ∪ hull(B)), so each block reduces to its
own ≤ h vertices before anything moves — the textbook example of a
geometric summary that composes like a sketch).

Exact integer geometry: strict cross-product turns (collinear points
are NOT vertices), points deduped and lexicographically sorted, so
the vertex cycle and the shoelace 2·area are deterministic integers
the oracle replays push/pop by push/pop.

100-TB shape: per-block hull inside map_batches (each block's
contribution is ≤ its hull size, typically O(log n) for random
data), one tiny driver close over the unioned block hulls. Use:
embedding-scatter extent auditing, outlier envelope extraction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(points) -> list:
    """Hull vertices, CCW starting at the lexicographically smallest
    point; strict turns (no collinear vertices). Degenerate inputs
    (<=2 distinct points, or all collinear) return the sorted
    distinct extreme set."""
    pts = sorted(set(map(tuple, points)))
    if len(pts) <= 2:
        return pts
    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) == 2 and hull[0] == hull[1]:  # all collinear
        return [hull[0]]
    return hull


def shoelace2(hull) -> int:
    """2x the polygon area (integer, >= 0 for CCW hulls)."""
    n = len(hull)
    if n < 3:
        return 0
    s = 0
    for i in range(n):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def convex_hull(ds, x_col: str, y_col: str) -> pd.DataFrame:
    """Hull of an (x, y) int-point Dataset: per-block hull combiner,
    driver close over the unioned block hulls. Returns one row per
    vertex ``(vertex_idx, x, y, n_vertices, area2)`` in CCW order
    from the lexicographic minimum."""

    def block_hull(b: pa.Table) -> pa.Table:
        xs = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = monotone_chain(zip(xs.tolist(), ys.tolist()))
        return pa.table(
            {
                "x": pa.array([p[0] for p in h], pa.int64()),
                "y": pa.array([p[1] for p in h], pa.int64()),
            }
        )

    parts = ds.map_batches(block_hull, batch_format="pyarrow").take_all()
    hull = monotone_chain((int(r["x"]), int(r["y"])) for r in parts)
    a2 = shoelace2(hull)
    return pd.DataFrame(
        {
            "vertex_idx": pd.array(range(1, len(hull) + 1), dtype="int64"),
            "x": pd.array([p[0] for p in hull], dtype="int64"),
            "y": pd.array([p[1] for p in hull], dtype="int64"),
            "n_vertices": pd.array([len(hull)] * len(hull), dtype="int64"),
            "area2": pd.array([a2] * len(hull), dtype="int64"),
        }
    )
