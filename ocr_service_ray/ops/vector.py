"""Vector-column aggregation — per-group embedding centroids.

The embedding layer of a curation pipeline needs per-class/per-cluster
centroids (IVF training, class prototypes, drift monitoring) over a
``list<float>`` column. Elementwise sums are decomposable, so the op
is combiner-shaped: each block collapses to ≤ |groups| × dim exploded
``(group, dim, sum, n)`` partial rows (vectorized ``np.add.at`` over
the block's flattened vectors), and one ``grouped_agg`` merges them —
the shuffle moves group×dim partials, never vectors.

Oracle determinism: float summation is association-order-dependent,
so the oracled path sums MICRO-INTS (each element ×1e6, half-up) —
exact under any association on both engines (the repo-wide
discipline). ``centroids()`` divides back out driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _flat_vectors(col) -> np.ndarray:
    """(n, dim) float64 view of a fixed-dim list<float> column."""
    chunk = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(chunk.flatten(), dtype=np.float64)
    return flat.reshape(len(chunk), -1)


def grouped_vector_sum(
    ds,
    group_col: str,
    vec_col: str = "embedding",
    micro: bool = True,
):
    """Dataset ``(group, dim, vsum, n)`` — elementwise vector sum and
    member count per group. ``micro=True`` (the oracled contract)
    sums ``floor(v*1e6 + 0.5)`` int64s; ``micro=False`` sums raw
    floats (production path; not association-exact)."""
    from ocr_service_ray.ops.agg import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        vecs = _flat_vectors(b[vec_col])
        n_rows, dim = vecs.shape if vecs.size else (0, 0)
        if n_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], b[group_col].type),
                    "dim": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.int64() if micro else pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        if micro:
            vecs = np.floor(vecs * 1000000.0 + 0.5).astype(np.int64)
        groups, codes = np.unique(
            b[group_col].to_numpy(zero_copy_only=False), return_inverse=True
        )
        sums = np.zeros((len(groups), dim), dtype=vecs.dtype)
        np.add.at(sums, codes, vecs)
        counts = np.bincount(codes, minlength=len(groups))
        g_rep = np.repeat(groups, dim)
        return pa.table(
            {
                group_col: pa.array(g_rep, b[group_col].type),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(groups))),
                "vsum": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts, dim).astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(
        partials,
        [group_col, "dim"],
        {"vsum": ("vsum", "sum"), "n": ("n", "sum")},
    )


def centroids(ds, group_col: str, vec_col: str = "embedding") -> pd.DataFrame:
    """Per-group mean vectors as a driver-side DataFrame
    ``group → np.ndarray(dim)`` (groups × dim is small by contract)."""
    t = grouped_vector_sum(ds, group_col, vec_col, micro=False).to_pandas()
    out = {}
    for g, sub in t.groupby(group_col):
        sub = sub.sort_values("dim")
        out[g] = sub["vsum"].to_numpy() / sub["n"].to_numpy()
    return pd.DataFrame(
        {group_col: list(out), "centroid": [out[g] for g in out]}
    )
