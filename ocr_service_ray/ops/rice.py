"""Golomb-Rice parameter selection — Rice 1971 / Golomb 1966: pick
the parameter k minimizing the exact encoded size of a gap stream,
bits(g; k) = ((g-1) >> k) + 1 + k (unary quotient + stop bit + k
remainder bits, gaps >= 1 encoded as g-1). THE posting-list /
delta-compression tuning knob for inverted indexes (ops/invindex)
and sorted-id layouts — computed exactly, no entropy approximation.

100-TB shape: gaps are per-key diffs inside one bucketed shuffle;
every block then folds partial bit-sums FOR ALL k in one vectorized
pass (a 17-value combiner row per block), so choosing k costs one
scan. The oracle replays gaps with a lag window and every k with
generate_series."""

from __future__ import annotations

import numpy as np
import pandas as pd


def rice_bits(gaps: np.ndarray, k: int) -> int:
    g = np.asarray(gaps, dtype=np.int64) - 1
    return int(((g >> k) + 1 + k).sum())


def rice_table(gaps: np.ndarray, k_max: int = 15) -> pd.DataFrame:
    """(k, total_bits, n_gaps, is_best) for k = 0..k_max; ties to
    the smallest k. Empty input: all-zero bits, best k = 0."""
    gaps = np.asarray(gaps, dtype=np.int64)
    n = len(gaps)
    rows = []
    best_k, best_bits = 0, None
    for k in range(k_max + 1):
        b = rice_bits(gaps, k) if n else 0
        rows.append((k, b, n))
        if best_bits is None or b < best_bits:
            best_k, best_bits = k, b
    out = pd.DataFrame(rows, columns=["k", "total_bits", "n_gaps"])
    out["is_best"] = (out["k"] == best_k).astype(int)
    return out.astype("int64")


def rice_plan(ds, key_col: str, id_col: str, k_max: int = 15) -> pd.DataFrame:
    """Optimal Rice parameter for the per-key sorted-id gap stream,
    in one bucketed shuffle + one combiner."""
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    def gaps_of(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy(dtype=np.int64))
        d = np.diff(ids)
        d = d[d >= 1]
        rows = {"k": [], "bits": [], "n": []}
        for k in range(k_max + 1):
            rows["k"].append(k)
            rows["bits"].append(rice_bits(d, k) if len(d) else 0)
            rows["n"].append(len(d))
        return pd.DataFrame(rows)

    partials = bucketed_map_groups(ds, [key_col], gaps_of)
    agg = (
        grouped_agg(
            partials,
            ["k"],
            {"total_bits": ("bits", "sum"), "n_gaps": ("n", "sum")},
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    best = agg.sort_values(["total_bits", "k"]).iloc[0]["k"]
    agg["is_best"] = (agg["k"] == best).astype(int)
    return agg.astype("int64")
