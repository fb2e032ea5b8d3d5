"""Activity bitmaps — a calendar-position presence mask per key.

The roaring-bitmap idea at its smallest useful size: a key's activity
profile over a BOUNDED calendar axis (day-of-month 1..31, hour-of-day
0..23) packs into one int64 — bit (position) set iff the key had at
least one event there. Bitmaps AND/OR cheaply downstream (cohort
overlap, "active weekday mornings" masks) and cost 8 bytes per key
instead of a day-list.

Distributed shape: dedupe (key, position) with one combiner aggregate
(an event-heavy key collapses to <= width rows per block before the
exchange), then SUM the distinct powers-of-two per key — over distinct
positions, sum == bitwise OR, so plain integer aggregation (exact,
association-free, and expressible as SQL SUM over a DISTINCT CTE)
replaces a bit_or fold. Positions are < 62, so the mask stays a
positive int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_UNITS = {
    # unit -> (extractor over a pandas DatetimeIndex, bit offset)
    "day_of_month": (lambda idx: idx.day.to_numpy(), -1),  # 1..31 -> bits 0..30
    "hour_of_day": (lambda idx: idx.hour.to_numpy(), 0),  # 0..23 -> bits 0..23
}


def activity_bitmap(ds, key_col: str, ts_col: str = "ts", unit: str = "day_of_month"):
    """Dataset ``(key, bitmap, n_active)``: per key the OR of
    ``1 << position`` over its DISTINCT calendar positions, plus the
    distinct-position count (== popcount of the bitmap)."""
    from .agg import grouped_agg

    if unit not in _UNITS:
        raise ValueError(f"unsupported unit: {unit} (have {sorted(_UNITS)})")
    extract, off = _UNITS[unit]

    def prep(b: pa.Table) -> pa.Table:
        idx = pd.DatetimeIndex(b[ts_col].to_pandas())
        pos = extract(idx).astype(np.int64) + off
        return pa.table({key_col: b[key_col], "pos": pa.array(pos)})

    distinct = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        [key_col, "pos"],
        {"n": (None, "count")},
    )

    def to_power(b: pa.Table) -> pa.Table:
        pos = b["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: b[key_col],
                "pow": pa.array(np.left_shift(np.int64(1), pos)),
            }
        )

    powers = distinct.map_batches(to_power, batch_format="pyarrow")
    return grouped_agg(
        powers,
        [key_col],
        {"bitmap": ("pow", "sum"), "n_active": (None, "count")},
    )
