"""Bounded-memory heavy hitters (Misra–Gries) with an exact verify
pass — the frequent-token / hot-key discovery step when the distinct
universe is too large for an exact value-counts pass (web-scale token
vocabularies, URL hosts, user ids).

Why not ``grouped_agg`` value counts? Its shuffle moves one row per
(block, distinct value) — fine while the distinct universe is bounded,
but a hapax-heavy vocabulary makes the count table itself corpus-sized.
Misra–Gries bounds EVERY intermediate at ``capacity`` rows:

  phase 1  per block: exact block counts, then the batched MG
           decrement — if the block has more than ``capacity``
           distinct values, subtract the (capacity+1)-th largest
           count from all and keep the positive remainder (the
           classic "decrement all counters" step, applied in one
           vectorized stroke);
  phase 2  merge partials by key (one combiner shuffle over ≤
           capacity rows per block; the summed undercounts spread
           across the cluster, never the driver) and keep the top
           ``capacity`` by summed count via the combiner top-k —
           rank-equivalent to the classic MG trim (subtracting the
           (capacity+1)-th count shifts every counter equally), and
           only ≤ capacity candidate rows ever reach the driver;
  phase 3  EXACT counts for the candidate set only: one re-scan with
           the candidates broadcast (vectorized isin), then a tiny
           grouped count — so reported counts are exact, not sketch
           estimates.

Guarantee (standard MG): any value with true count > N / (capacity+1)
survives phases 1-2, so top-k by exact count equals the true top-k
whenever the k-th item clears that bar — true for Zipf-shaped data at
reasonable capacity, and checkable: the returned counts make the bar
explicit (``min(count) > N/(capacity+1)`` certifies exactness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _mg_trim(keys: np.ndarray, counts: np.ndarray, capacity: int):
    """Batched Misra–Gries decrement: keep ≤ capacity (key, count)
    pairs by subtracting the (capacity+1)-th largest count."""
    if len(keys) <= capacity:
        return keys, counts
    # kth largest via partition (descending order not needed in full)
    thresh = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
    kept = counts - thresh
    mask = kept > 0
    return keys[mask], kept[mask]


def heavy_hitters(
    ds,
    col: str,
    k: int = 10,
    capacity: int = 4096,
    explode_tokens: bool = False,
    text_col: str = "text",
):
    """Top-``k`` most frequent values of ``col`` (or of whitespace
    tokens of ``text_col`` when ``explode_tokens``) with EXACT counts,
    discovered through a capacity-bounded sketch. Ties break on the
    smaller value. Returns a pandas DataFrame (value, n) sorted by
    (n desc, value asc) — k rows.

    Exactness of the top-k holds when the k-th count clears the MG
    bar N/(capacity+1); the caller can certify from the output (the
    returned counts are exact either way)."""

    def partial(b: pa.Table) -> pa.Table:
        if explode_tokens:
            vals = pc.list_flatten(pc.split_pattern(b[text_col], " "))
        else:
            vals = b[col]
        arr = vals.to_numpy(zero_copy_only=False)
        keys, counts = np.unique(arr, return_counts=True)
        keys, counts = _mg_trim(keys, counts.astype(np.int64), capacity)
        return pa.table(
            {"value": pa.array(keys), "c": pa.array(counts, pa.int64())}
        )

    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.relational import topk

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = grouped_agg(partials, ["value"], {"c": ("c", "sum")})
    cand_df = topk(merged, by=["c", "value"], k=capacity, descending=[True, False])
    if hasattr(cand_df, "to_pandas"):
        cand_df = cand_df.to_pandas()
    if len(cand_df) == 0:
        return pd.DataFrame({"value": [], "n": []})
    keys = cand_df["value"].to_numpy()
    # phase 3: exact counts for the candidate set only
    import ray

    cand_ref = ray.put(np.sort(keys))

    def exact(b: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        if explode_tokens:
            vals = pc.list_flatten(pc.split_pattern(b[text_col], " "))
        else:
            vals = b[col]
        arr = vals.to_numpy(zero_copy_only=False)
        hit = arr[np.isin(arr, cand)]
        kk, cc = np.unique(hit, return_counts=True)
        return pa.table({"value": pa.array(kk), "n": pa.array(cc.astype(np.int64))})

    counts_df = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
    out = counts_df.groupby("value", sort=False, as_index=False)["n"].sum()
    out = out.sort_values(["n", "value"], ascending=[False, True], kind="stable")
    return out.head(k).reset_index(drop=True)
