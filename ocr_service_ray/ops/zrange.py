"""Morton range-scan planning — the Tropf-Herzog problem (1981):
a rectangular query box maps to a set of CONTIGUOUS Z-code runs;
scanning runs instead of the naive [zmin, zmax] span is what makes
z-indexed layouts (ops/zorder.py) actually prune. The engine derives
the runs by REGION-QUADTREE decomposition (maximal z-aligned squares
are contiguous Morton intervals; adjacent intervals merge), the
oracle by brute-enumerating every grid cell — independent
algorithms, one answer.

Contract (bits-order grid, closed integer box):
  runs = maximal contiguous Morton intervals covering exactly the
  box's cells; per run report (z_start, z_end, n_cells, n_rows)
  where n_rows counts data rows whose quantized cell lies in the
  run. Quantization follows ops/zorder.py (global min/max floor
  division).

100-TB shape: planning is O(box perimeter) driver work; the row
census is ONE scan with the run table broadcast (vectorized
searchsorted)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _quad_blocks(x0: int, y0: int, size: int, box: tuple[int, int, int, int], out: list):
    """Maximal aligned squares of the quadtree fully inside the box."""
    bx0, bx1, by0, by1 = box
    if x0 > bx1 or y0 > by1 or x0 + size - 1 < bx0 or y0 + size - 1 < by0:
        return
    from ocr_service_ray.ops.zorder import morton_interleave

    if x0 >= bx0 and x0 + size - 1 <= bx1 and y0 >= by0 and y0 + size - 1 <= by1:
        z0 = int(
            morton_interleave(
                np.array([x0], np.int64), np.array([y0], np.int64), 16
            )[0]
        )
        out.append((z0, z0 + size * size - 1))
        return
    if size == 1:
        return
    h = size // 2
    for dx in (0, h):
        for dy in (0, h):
            _quad_blocks(x0 + dx, y0 + dy, h, box, out)


def morton_runs(bits: int, box: tuple[int, int, int, int]) -> list[tuple[int, int]]:
    """Merged contiguous Morton intervals covering the box."""
    blocks: list[tuple[int, int]] = []
    _quad_blocks(0, 0, 1 << bits, box, blocks)
    blocks.sort()
    runs: list[tuple[int, int]] = []
    for s, e in blocks:
        if runs and s == runs[-1][1] + 1:
            runs[-1] = (runs[-1][0], e)
        else:
            runs.append((s, e))
    return runs


def zrange_plan(
    ds, x_col: str, y_col: str, box: tuple[int, int, int, int], bits: int = 5
) -> pd.DataFrame:
    """Per-run scan plan + row census over int64 columns quantized
    to the 2^bits grid (ops/zorder.py rule). Returns ``(run_id,
    z_start, z_end, n_cells, n_rows)``."""
    from ocr_service_ray.ops.agg import global_agg, grouped_agg
    from ocr_service_ray.ops.zorder import morton_interleave

    runs = morton_runs(bits, box)
    starts = np.array([s for s, _ in runs], np.int64)
    ends = np.array([e for _, e in runs], np.int64)
    span = global_agg(
        ds,
        {
            "min_x": (x_col, "min"),
            "max_x": (x_col, "max"),
            "min_y": (y_col, "min"),
            "max_y": (y_col, "max"),
        },
    )
    lx, hx = int(span["min_x"]), int(span["max_x"])
    ly, hy = int(span["min_y"]), int(span["max_y"])
    grid = 1 << bits

    def census(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qx = (x - lx) * grid // (hx - lx + 1)
        qy = (y - ly) * grid // (hy - ly + 1)
        z = morton_interleave(qx, qy, bits)
        idx = np.searchsorted(starts, z, side="right") - 1
        ok = (idx >= 0) & (z <= ends[np.clip(idx, 0, len(ends) - 1)])
        return pa.table(
            {
                "run_id": pa.array(idx[ok].astype(np.int64)),
                "one": pa.array(np.ones(int(ok.sum()), np.int64)),
            }
        )

    counts = (
        grouped_agg(
            ds.map_batches(census, batch_format="pyarrow"),
            ["run_id"],
            {"n_rows": ("one", "sum")},
        )
        .to_pandas()
        .set_index("run_id")["n_rows"]
        .to_dict()
    )
    rows = [
        (i, s, e, e - s + 1, int(counts.get(i, 0)))
        for i, (s, e) in enumerate(runs)
    ]
    return pd.DataFrame(
        rows, columns=["run_id", "z_start", "z_end", "n_cells", "n_rows"]
    ).astype("int64")
