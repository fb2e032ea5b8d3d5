"""Hilbert-curve clustering layout — the space-filling curve with
strictly better locality than Morton/Z-order (Hilbert 1891; Moon et
al. 2001 for the clustering bound): consecutive curve positions are
ALWAYS grid neighbours, so fixed-width file splits get tighter
bounding boxes and better min/max pruning than a Z-order rewrite of
the same data.

The op emits, side by side, the per-file stats (count, quantized
min/max per dimension, bbox area) a rewrite under the HILBERT layout
and under the MORTON layout would produce — the zorder_file_stats
planner shape extended with the curve the lakehouses don't give you.

Exact-integer discipline (SQL-replayable):
- quantization: q = ((v - min) * 2^bits) // (max - min + 1), global
  min/max from one combiner aggregate (ops/zorder.py rule);
- Hilbert index: the classic bit-level loop (s = 2^(bits-1) .. 1):
  rx = (x//s) % 2, ry = (y//s) % 2, d += s^2 * ((3*rx) XOR ry),
  then the (ry=0) quadrant rotation with n-1-coordinate flips —
  vectorized numpy here, 5 unrolled CTE steps in the oracle;
- file assignment: code >> (2*bits - log2(n_files)).

100-TB shape: one scan quantizes + indexes, folds to a per-(layout,
file) stats combiner — ≤ 2*n_files rows move; no row-level shuffle,
no global sort."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hilbert_index(qx: np.ndarray, qy: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized xy->d for the order-``bits`` Hilbert curve on the
    2^bits x 2^bits grid."""
    n = 1 << bits
    x = qx.astype(np.int64).copy()
    y = qy.astype(np.int64).copy()
    d = np.zeros(len(x), np.int64)
    s = n >> 1
    while s > 0:
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * ((3 * rx) ^ ry)
        ry0 = ry == 0
        flip = ry0 & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        nx = np.where(ry0, yf, x)
        ny = np.where(ry0, xf, y)
        x, y = nx, ny
        s >>= 1
    return d


def hilbert_vs_morton_stats(
    ds, x_col: str, y_col: str, bits: int = 5, n_files: int = 16
) -> pd.DataFrame:
    """Per-file stats under the Hilbert and Morton layouts of the
    int64 columns (``x_col``, ``y_col``). Returns ``(layout,
    file_id, n_rows, min_qx, max_qx, min_qy, max_qy, bbox_area)``
    sorted by (layout, file_id); empty key ranges emit no row."""
    from ocr_service_ray.ops.agg import global_agg, grouped_agg
    from ocr_service_ray.ops.zorder import morton_interleave

    k = int(n_files).bit_length() - 1
    if 1 << k != n_files:
        raise ValueError("n_files must be a power of two")
    shift = 2 * bits - k

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

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qx = (x - lx) * grid // (hx - lx + 1)
        qy = (y - ly) * grid // (hy - ly + 1)
        hd = hilbert_index(qx, qy, bits)
        zv = morton_interleave(qx, qy, bits)
        lay = np.concatenate(
            [np.zeros(len(x), np.int64), np.ones(len(x), np.int64)]
        )
        fid = np.concatenate([hd >> shift, zv >> shift])
        qx2 = np.concatenate([qx, qx])
        qy2 = np.concatenate([qy, qy])
        return pa.table(
            {
                "lay": pa.array(lay),
                "file_id": pa.array(fid),
                "n": pa.array(np.ones(2 * len(x), np.int64)),
                "qx": pa.array(qx2),
                "qy": pa.array(qy2),
            }
        )

    out = (
        grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["lay", "file_id"],
            {
                "n_rows": ("n", "sum"),
                "min_qx": ("qx", "min"),
                "max_qx": ("qx", "max"),
                "min_qy": ("qy", "min"),
                "max_qy": ("qy", "max"),
            },
        )
        .to_pandas()
        .sort_values(["lay", "file_id"])
        .reset_index(drop=True)
    )
    out["layout"] = np.where(out["lay"] == 0, "hilbert", "morton")
    out["bbox_area"] = (out["max_qx"] - out["min_qx"] + 1) * (
        out["max_qy"] - out["min_qy"] + 1
    )
    cols = [
        "layout",
        "file_id",
        "n_rows",
        "min_qx",
        "max_qx",
        "min_qy",
        "max_qy",
        "bbox_area",
    ]
    out = out[cols]
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    return out
