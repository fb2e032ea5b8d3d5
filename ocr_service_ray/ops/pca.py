"""Distributed top principal component via power iteration — the
embedding-whitening / dominant-direction step of an embedding-heavy
curation pipeline (SemDeDup-style clustering prep, anisotropy
audits), expressed as fixed Ray Data rounds like ``ops/kmeans.py`` /
``ops/logistic.py`` — but, unlike those, EXACTLY oracled: every
round is SQL-reproducible, so the whole iteration hash-matches a
DuckDB CTE chain.

Per round (100 TB shape): the direction vector v (dim floats) is
broadcast via ``ray.put``; ONE ``map_batches`` pass computes each
row's projection t = x·v and quantizes the per-row, per-dim
contribution micro-int ``floor(t · x_j · 1e6 + 0.5)``; blocks
collapse to dim-bounded partials merged by one combiner. Vectors
never shuffle; the driver holds dim ints.

Determinism / oracle discipline:

- the dot product accumulates in FIXED dimension order (explicit
  per-dim loop — the ``ops/logistic.sigmoid_fixed_dot`` rule), which
  SQL reproduces as a generated left-associative expression;
- per-row contributions are micro-int quantized BEFORE summation
  (integer addition is associative → layout-invariant);
- between rounds v is renormalized by its L∞ norm — ``v_j = s_j / m``
  with m = max|s_j| — ONE IEEE division per dim, no sqrt, no
  transcendentals (the repo-wide oracle rule; L2 normalization is a
  monotone rescale and changes nothing about the direction).
- ``iters`` is fixed (not convergence-tested) so the oracle can
  unroll rounds as CTEs — the kmeans contract. The sign of the
  result follows the v0 = e_1 start deterministically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pca_top_component", "fixed_order_dot"]


def fixed_order_dot(X: np.ndarray, v: np.ndarray) -> np.ndarray:
    """x·v accumulated in fixed dimension order (left-assoc), matching
    the generated SQL expression term for term."""
    t = np.zeros(len(X), dtype=np.float64)
    for j in range(X.shape[1]):
        t = t + v[j] * X[:, j]
    return t


def pca_top_component(ds, col: str = "embedding", iters: int = 3):
    """pandas ``(dim, v_micro)`` — the dominant direction after
    ``iters`` power-iteration rounds, L∞-normalized, micro-int
    quantized. ``ds`` must be cheaply re-scannable (parquet-backed or
    materialized — the kmeans contract); each round is one scan."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.similarity import _as_matrix

    # probe the dimension from one row (metadata-cheap)
    first = ds.limit(1).take(1)[0][col]
    dim = len(first)

    v = np.zeros(dim, dtype=np.float64)
    v[0] = 1.0

    for _ in range(iters):
        v_ref = ray.put(v)

        def contrib(batch: pa.Table) -> pa.Table:
            import ray as _ray

            vv = _ray.get(v_ref)
            X = _as_matrix(batch[col]).astype(np.float64)
            t = fixed_order_dot(X, vv)
            # micro-int per (row, dim), then block-collapse: the
            # partial a combiner merges is dim ints per block
            c = np.floor(t[:, None] * X * 1_000_000.0 + 0.5).astype(np.int64)
            s = c.sum(axis=0)
            return pa.table(
                {
                    "dim": pa.array(np.arange(dim, dtype=np.int64)),
                    "c": pa.array(s),
                }
            )

        s_tbl = grouped_agg(
            ds.map_batches(contrib, batch_format="pyarrow"),
            ["dim"],
            {"s": ("c", "sum")},
        ).to_pandas()
        s = np.zeros(dim, dtype=np.int64)
        for d, val in zip(s_tbl["dim"], s_tbl["s"]):
            s[int(d)] = int(val)
        m = int(np.abs(s).max())
        if m == 0:  # degenerate input: stay at the start vector
            break
        v = s.astype(np.float64) / float(m)

    v_micro = np.floor(v * 1_000_000.0 + 0.5).astype(np.int64)
    return pd.DataFrame(
        {"dim": np.arange(dim, dtype=np.int64), "v_micro": v_micro}
    )
