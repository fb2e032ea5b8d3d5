"""Closest pair of points — the classic sweep-line algorithm
(Shamos & Hoey 1975 / Bentley's y-window sweep): sort by x, keep the
active window of points whose x-distance can still beat the best
pair, probe only y-neighbours. O(n log n) with exact integer
squared distances — no sqrt, no floats, so argmin and ties are
bit-reproducible against the oracle's O(n^2) self-join.

Contract: minimize dx^2 + dy^2 over unordered id pairs; ties break
to the smallest (id_a, id_b) with id_a < id_b. Duplicate coordinates
give dist2 = 0.

100-TB shape: the scatter is the per-key combiner output (the only
shuffle — ops/hull.py discipline); the sweep closes on the
|keys|-bounded table. For scatter sets beyond driver reach, run the
same sweep per Hilbert/grid cell with boundary bands (the op's
pruning logic is cell-local by construction)."""

from __future__ import annotations

import bisect

import pandas as pd


def closest_pair(points: pd.DataFrame, id_col: str, x_col: str, y_col: str) -> pd.DataFrame:
    """One-row DataFrame ``(id_a, id_b, dist2)`` for the closest
    pair; empty frame when fewer than 2 points."""
    pts = sorted(
        (int(x), int(y), int(i))
        for i, x, y in zip(points[id_col], points[x_col], points[y_col])
    )
    n = len(pts)
    if n < 2:
        return pd.DataFrame(columns=["id_a", "id_b", "dist2"]).astype("int64")
    best = None  # (d2, ida, idb)
    # window: list of (y, x, id) kept sorted by y
    window: list[tuple[int, int, int]] = []
    pending: list[tuple[int, int, int]] = []  # x-ordered, for eviction
    for x, y, pid in pts:
        # evict points whose dx^2 strictly exceeds best
        if best is not None:
            while pending and (x - pending[0][0]) ** 2 > best[0]:
                ox, oy, oid = pending.pop(0)
                j = bisect.bisect_left(window, (oy, ox, oid))
                window.pop(j)
        # probe y-neighbours
        lo = 0
        if best is not None:
            lo = bisect.bisect_left(window, (y - int(best[0] ** 0.5) - 1, -(1 << 62), 0))
        for wy, wx, wid in window[lo:]:
            dy2 = (wy - y) ** 2
            if best is not None and dy2 > best[0] and wy > y:
                break
            d2 = (wx - x) ** 2 + dy2
            a, b = (wid, pid) if wid < pid else (pid, wid)
            cand = (d2, a, b)
            if best is None or cand < best:
                best = cand
        bisect.insort(window, (y, x, pid))
        pending.append((x, y, pid))
    return pd.DataFrame(
        {"id_a": [best[1]], "id_b": [best[2]], "dist2": [best[0]]}
    ).astype("int64")
