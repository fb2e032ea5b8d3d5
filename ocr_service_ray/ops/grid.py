"""Dense time-grid aggregation — gap-filled counts per (key, period).

A plain GROUP BY emits no row for a (key, hour) cell with zero
events, but training monitors / seasonality models need the dense
grid. This op fills the gaps exactly:

1. one combiner aggregate for the observed (key, period) counts;
2. one combiner aggregate for the distinct keys and one global
   min/max for the period span (three tiny exchanges, raw rows
   shuffle once);
3. the |keys| x |periods| grid is generated ON THE DRIVER and
   left-merged with the observed counts.

The driver grid is bounded by vocabulary x calendar (event types x
hours: thousands), never by data volume — the caller's contract, as
with every vocabulary-bounded driver structure in this repo. For a
high-cardinality key, generate the grid distributed instead: cross
the distinct-key Dataset with a from_items period axis via
``bucketed_map_groups`` and left-join counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import global_agg, grouped_agg


def _period_of(ts_col, batch: pa.Table, freq: str) -> np.ndarray:
    vals = batch[ts_col].to_pandas()
    if freq == "hour":
        return pd.DatetimeIndex(vals).values.astype("datetime64[h]").astype(np.int64)
    if freq == "day":
        return pd.DatetimeIndex(vals).values.astype("datetime64[D]").astype(np.int64)
    raise ValueError(f"unsupported freq: {freq}")


def dense_grid_counts(ds, key_col: str, ts_col: str = "ts", freq: str = "hour"):
    """Counts per (key, period) over the FULL observed key x period
    grid, zero-filled. period is integer epoch-hours / epoch-days.
    Returns pandas (grid-bounded)."""

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"k": b[key_col], "p": pa.array(_period_of(ts_col, b, freq))}
        )

    pairs = ds.map_batches(prep, batch_format="pyarrow")
    counts = grouped_agg(pairs, ["k", "p"], {"n": (None, "count")}).to_pandas()
    span = global_agg(pairs, {"lo": ("p", "min"), "hi": ("p", "max")})
    if span["lo"] is None:
        return pd.DataFrame({key_col: [], "period": [], "n": []})
    keys = np.sort(counts["k"].unique())
    periods = np.arange(int(span["lo"]), int(span["hi"]) + 1, dtype=np.int64)
    grid = pd.DataFrame(
        {
            key_col: np.repeat(keys, len(periods)),
            "period": np.tile(periods, len(keys)),
        }
    )
    out = grid.merge(
        counts.rename(columns={"k": key_col, "p": "period"}), how="left"
    )
    out["n"] = out["n"].fillna(0).astype("int64")
    return out
