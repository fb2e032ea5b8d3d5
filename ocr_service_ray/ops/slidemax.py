"""Sliding-window max/min via monotonic deques — the O(n) amortized
ascending-minima algorithm (Richter's trick / the deque behind
streaming rate limiters and peak trackers): each element enters and
leaves its deque once, vs the O(n·k) rescan a naive window does.
The oracle uses SQL's native ``MAX() OVER (ROWS k-1 PRECEDING)`` —
a genuinely independent evaluation path.

Determinism contract: per key, events ordered by (ts, event_id);
window = the last ``k`` rows including the current one (shorter at
the head); values are floor-cents. ``is_record`` flags rows whose
value equals their window max.

100-TB shape: one coarse-bucket key shuffle co-locates each key
(the cumulative_by_key discipline — per-key rows must fit a task),
then the deque pass is vectorized-adjacent linear work per group."""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd


def _window_extrema(vals: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(vals)
    mx = np.empty(n, np.int64)
    mn = np.empty(n, np.int64)
    dq_max: deque[int] = deque()
    dq_min: deque[int] = deque()
    for i in range(n):
        while dq_max and vals[dq_max[-1]] <= vals[i]:
            dq_max.pop()
        dq_max.append(i)
        while dq_min and vals[dq_min[-1]] >= vals[i]:
            dq_min.pop()
        dq_min.append(i)
        lo = i - k + 1
        if dq_max[0] < lo:
            dq_max.popleft()
        if dq_min[0] < lo:
            dq_min.popleft()
        mx[i] = vals[dq_max[0]]
        mn[i] = vals[dq_min[0]]
    return mx, mn


def sliding_extrema(
    ds,
    key_col: str,
    order_cols: list[str],
    cents_col: str,
    k: int = 5,
):
    """Per-key last-k-rows max/min (monotonic deques). Emits
    ``(key, *order, cents, win_max, win_min, is_record)``."""
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable").reset_index(drop=True)
        mx, mn = _window_extrema(
            g[cents_col].to_numpy(dtype=np.int64), k
        )
        g["win_max"] = mx
        g["win_min"] = mn
        g["is_record"] = (
            g[cents_col].to_numpy(dtype=np.int64) == mx
        ).astype(np.int64)
        return g

    return bucketed_map_groups(ds, [key_col], fold)
