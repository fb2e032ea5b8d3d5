"""Distributed full-batch logistic regression (gradient descent) —
the model-training step of a data pipeline (quality classifiers,
filter calibration) expressed as Ray Data rounds, the iterative
sibling of ``ops/kmeans.py``.

Per round (100 TB shape): the weight vector (dim floats) is BROADCAST
via ``ray.put``; ONE ``map_batches`` pass computes each block's
gradient partial — per-row residual r = σ(x·w) − y, per-dim
contribution r·x_j — and collapses the block to ``dim`` partial rows.
One tiny aggregate merges |blocks|×dim rows; the driver applies the
update. Feature rows never shuffle, predictions are never
materialized.

Determinism (layout-invariance, the kmeans discipline): per-row float
work (σ, products) is identical under any block layout; per-row
contributions are quantized to MICRO-INTS (×1e6, half-up) BEFORE
summation, so the merged gradient — and every round's weights — are
byte-identical under any partitioning or merge order (integer
addition is associative, float addition is not). The dot product
x·w accumulates in fixed dimension order (explicit per-dim loop, not
BLAS) for the same reason. Asserted in tests against a one-process
numpy reference implementing the identical arithmetic, and under
repartitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_service_ray.ops.vector import _flat_vectors

__all__ = ["logistic_gd", "sigmoid_fixed_dot"]


def sigmoid_fixed_dot(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    """σ(X·w) with the dot product accumulated in FIXED dimension
    order (elementwise, left-assoc) — layout-invariant, unlike BLAS
    gemv whose summation order may vary with shape."""
    z = np.zeros(len(X), dtype=np.float64)
    for j in range(X.shape[1]):
        z += w[j] * X[:, j]
    return 1.0 / (1.0 + np.exp(-z))


def logistic_gd(
    ds,
    x_col: str = "x",
    y_col: str = "y",
    dim: int | None = None,
    iters: int = 15,
    lr: float = 1.0,
):
    """``iters`` rounds of full-batch GD over rows with a fixed-dim
    ``list<float>`` feature column and an int 0/1 label. Returns the
    final weights (float64 ndarray) and the row count. The caller owns
    materialization choices: pass a parquet-backed or materialized
    ``ds`` so each round re-reads cheaply (the kmeans contract)."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    if dim is None:
        first = ds.limit(1).take(1)
        dim = len(first[0][x_col])
    w = np.zeros(dim, dtype=np.float64)
    n_total: int | None = None

    for _ in range(iters):
        wref = ray.put(w.copy())

        def partial(b: pa.Table, _wref=wref) -> pa.Table:
            W = ray.get(_wref)
            X = _flat_vectors(b[x_col])
            y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
            r = sigmoid_fixed_dot(X, W) - y
            contrib = r[:, None] * X
            micro = np.floor(contrib * 1_000_000.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "dim": pa.array(np.arange(X.shape[1], dtype=np.int64)),
                    "gsum": pa.array(micro.sum(axis=0)),
                    "n": pa.array(
                        np.full(X.shape[1], len(X), dtype=np.int64)
                    ),
                }
            )

        g = grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["dim"],
            {"gsum": ("gsum", "sum"), "n": ("n", "sum")},
        ).to_pandas()
        g = g.sort_values("dim").reset_index(drop=True)
        if n_total is None:
            n_total = int(g["n"].iloc[0])
        grad = g["gsum"].astype("int64").to_numpy() / 1_000_000.0 / n_total
        w = w - lr * grad
    return w, int(n_total or 0)
