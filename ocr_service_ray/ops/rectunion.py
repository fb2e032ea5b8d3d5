"""Union-of-rectangles area — the classic coordinate-compression
sweep (Bentley 1977's measure problem, the segment-tree-free O(n^2)
form): total area covered by at least one axis-aligned rectangle,
vs the naive sum of areas — the exact overlap/redundancy audit for
coverage envelopes (time x value footprints of cohorts here;
scan-range coverage of files in general).

Determinism contract (integer, oracle-replayed on the compressed
grid): rectangles are CLOSED integer boxes [x1,x2] x [y1,y2] owning
the half-open cells [x1, x2+1) x [y1, y2+1) — a degenerate
point-box has area 1. union_area = sum over compressed slabs of
slab_width * merged-interval length; overlap_ppm =
10^6 * union_area // sum_area (0 when no rects).

100-TB shape: each rectangle is a per-cohort min/max combiner row
(the only exchange, |cohorts|-bounded by the key contract); the
sweep closes on the bounded rect table."""

from __future__ import annotations

import pandas as pd


def union_area(rects: pd.DataFrame) -> int:
    """Exact union area of closed integer boxes (x1, x2, y1, y2)."""
    boxes = [
        (int(a), int(b) + 1, int(c), int(d) + 1)
        for a, b, c, d in zip(rects["x1"], rects["x2"], rects["y1"], rects["y2"])
    ]
    xs = sorted({x for b in boxes for x in (b[0], b[1])})
    total = 0
    for x0, x1 in zip(xs, xs[1:]):
        ivs = sorted(
            (b[2], b[3]) for b in boxes if b[0] <= x0 and x1 <= b[1]
        )
        merged = 0
        cur_lo = cur_hi = None
        for lo, hi in ivs:
            if cur_hi is None or lo > cur_hi:
                if cur_hi is not None:
                    merged += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        if cur_hi is not None:
            merged += cur_hi - cur_lo
        total += (x1 - x0) * merged
    return total


def rect_union_report(rects: pd.DataFrame) -> pd.DataFrame:
    """One-row report ``(n_rects, union_area, sum_area,
    overlap_ppm)`` over a closed-integer-box table."""
    n = len(rects)
    ua = union_area(rects) if n else 0
    sa = int(
        (
            (rects["x2"] - rects["x1"] + 1) * (rects["y2"] - rects["y1"] + 1)
        ).sum()
    ) if n else 0
    ppm = 1_000_000 * ua // sa if sa else 0
    return pd.DataFrame(
        {
            "n_rects": [n],
            "union_area": [ua],
            "sum_area": [sa],
            "overlap_ppm": [ppm],
        }
    ).astype("int64")
