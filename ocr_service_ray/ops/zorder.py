"""Z-order (Morton-curve) clustering layout — the lakehouse
multi-column data-clustering move (Delta OPTIMIZE ZORDER BY /
Iceberg sort-order rewrite): interleave the bits of two columns so
files are locality-clustered in BOTH dimensions, and point/band
predicates on either column prune most files by min/max stats.

The op computes, in ONE scan + one tiny combiner exchange, the
per-file footer statistics a rewrite with this layout WOULD produce —
for the z-order layout and, side by side, the single-column linear
layout — so the pruning win is measurable before paying for the
rewrite (the planner shape: decide from stats, not by rewriting).

Exact-integer discipline (everything SQL-reproducible):

- quantization: ``q = ((v - min) * 2^bits) // (max - min + 1)`` with
  the global min/max from one combiner aggregate — floor division,
  no floats; q ∈ [0, 2^bits).
- Morton code: ``z = Σ_j bit_j(qx)·4^j·1 + bit_j(qy)·4^j·2`` — x in
  even bit positions, y in odd; pure shifts/masks (vectorized numpy
  here, a generated ``//``/``%`` polynomial in the oracle, the
  ``_simhash_oracle_sql`` pattern).
- file assignment: fixed-width key-range split, ``file_id =
  z >> (2·bits − log2(n_files))`` for z-order and ``qx >>
  (bits − log2(n_files))`` for linear — deterministic, shuffle-free
  (a real rewrite would repartition on file_id; the stats don't
  need to).

100 TB shape: the scan emits one (layout, file_id) partial per block
— ≤ 2·n_files rows — and the combiner merge is |files|-bounded. No
row-level shuffle, no sort: z-range splitting replaces the global
sort a naive ZORDER rewrite would run (uniform-ish after
quantization; skew shows up IN the emitted n_rows column, which is
the point of the report).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["morton_interleave", "zorder_file_stats"]


def morton_interleave(qx: np.ndarray, qy: np.ndarray, bits: int) -> np.ndarray:
    """Bit-interleave two quantized int64 arrays (x → even positions,
    y → odd). Vectorized; exact for bits ≤ 31."""
    z = np.zeros(len(qx), dtype=np.int64)
    for j in range(bits):
        z |= ((qx >> j) & 1) << (2 * j)
        z |= ((qy >> j) & 1) << (2 * j + 1)
    return z


def zorder_file_stats(
    ds,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int = 16,
):
    """Per-file min/max/count stats for the z-order AND linear-by-x
    layouts of ``ds`` (int64 columns). Returns a pandas frame
    ``(layout, file_id, n_rows, min_x, max_x, min_y, max_y)`` sorted
    by (layout, file_id) — ≤ 2·n_files rows. Empty files (key ranges
    no row maps to) emit no row, exactly like absent parquet files.
    """
    from ocr_service_ray.ops.agg import global_agg, grouped_agg

    k = int(n_files).bit_length() - 1
    if 1 << k != n_files:
        raise ValueError("n_files must be a power of two")

    span = global_agg(
        ds,
        {
            "min_x": (x_col, "min"),
            "max_x": (x_col, "max"),
            "min_y": (y_col, "min"),
            "max_y": (y_col, "max"),
        },
    )
    lo_x, hi_x = int(span["min_x"]), int(span["max_x"])
    lo_y, hi_y = int(span["min_y"]), int(span["max_y"])
    rng_x = hi_x - lo_x + 1
    rng_y = hi_y - lo_y + 1

    def assign(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qx = ((x - lo_x) * (1 << bits)) // rng_x
        qy = ((y - lo_y) * (1 << bits)) // rng_y
        z = morton_interleave(qx, qy, bits)
        zf = z >> (2 * bits - k)
        lf = qx >> (bits - k)
        return pa.table(
            {
                "layout": pa.array(
                    ["zorder"] * len(x) + ["linear"] * len(x), pa.string()
                ),
                "file_id": pa.array(np.concatenate([zf, lf])),
                "x": pa.array(np.concatenate([x, x])),
                "y": pa.array(np.concatenate([y, y])),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    stats = grouped_agg(
        assigned,
        ["layout", "file_id"],
        {
            "n_rows": ("x", "count"),
            "min_x": ("x", "min"),
            "max_x": ("x", "max"),
            "min_y": ("y", "min"),
            "max_y": ("y", "max"),
        },
    ).to_pandas()
    return stats.sort_values(["layout", "file_id"]).reset_index(drop=True)
