"""Distributed k-means (Lloyd's) over an embedding column — the
iterative companion of `ops/graph.py`'s label propagation: cluster
centroids for IVF training, corpus bucketing, diversity sampling.

Per-round shape (100 TB): centroids (k×dim floats) are BROADCAST via
``ray.put``; ONE ``map_batches`` pass per round both assigns (argmin
squared-L2, vectorized matmul) and collapses the block to ≤ k×dim
``(cluster, dim, sum, n)`` partial rows; one ``grouped_agg`` merges
partials. Vectors never shuffle, assignments are never materialized
— each round moves k×dim×|blocks| partial rows, full stop.

Determinism (layout-invariance): partial sums are MICRO-INTS
(elements ×1e6, half-up), so the merged sums — and therefore every
round's centroids — are identical under any block layout or merge
order (integer addition is associative; float partial sums are not).
Seeding is hash-deterministic: the k vectors with the smallest
``md5(id)``-derived uniform (combiner top-k), independent of
partitioning. Same corpus → same clustering, byte-for-byte, on any
cluster size — asserted in tests against a single-process numpy
reference implementing the identical arithmetic.
"""

from __future__ import annotations

from ocr_service_ray.ops.pool import bcast_stage

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_service_ray.ops.vector import _flat_vectors


def _seed_centroids(ds, vec_col: str, id_col: str, k: int) -> np.ndarray:
    """k seed vectors chosen by smallest md5-uniform of their id —
    deterministic and layout-independent (combiner top-k, no sort of
    the corpus)."""
    from ocr_service_ray.ops.relational import topk

    def add_hash(b: pa.Table) -> pa.Table:
        hs = [
            int(hashlib.md5(f"kmeans:{v}".encode()).hexdigest()[:15], 16)
            for v in b[id_col].to_pylist()
        ]
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                vec_col: b[vec_col],
            }
        )

    seeds = topk(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        ["h"],
        k,
        descending=[False],
    ).to_pandas()
    return np.stack([np.asarray(v, dtype=np.float64) for v in seeds[vec_col]])


def kmeans(
    ds,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iters: int = 20,
    merge: str = "distributed",
):
    """Returns ``(centroids ndarray (k, dim), n_iters)``. Stops when
    the micro-int centroid table repeats exactly (guaranteed finite:
    integer states, monotone Lloyd's objective) or at ``max_iters``."""
    from ocr_service_ray.ops.agg import grouped_agg

    cents = _seed_centroids(ds, vec_col, id_col, k)
    dim = cents.shape[1]

    for it in range(1, max_iters + 1):
        # centroids are k×dim floats (a few KB): plain TASK closure
        # capture, not an actor pool — a fresh pool per round costs
        # ~2-3s of actor spin-up (measured), while shipping a tiny
        # closure per task is free. Broadcast-via-ray.put is for BIG
        # per-round state, which this is not.
        c = cents
        c_sq = (c * c).sum(axis=1)

        def assign_and_sum(b: pa.Table, c=c, c_sq=c_sq) -> pa.Table:
            v = _flat_vectors(b[vec_col])
            if v.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            # argmin ||v-c||^2 = argmin (c·c - 2 v·c); ties → lowest
            # cluster index (np.argmin contract, mirrored in tests)
            d = c_sq[None, :] - 2.0 * (v @ c.T)
            a = np.argmin(d, axis=1)
            micro = np.floor(v * 1000000.0 + 0.5).astype(np.int64)
            sums = np.zeros((len(c), micro.shape[1]), dtype=np.int64)
            np.add.at(sums, a, micro)
            counts = np.bincount(a, minlength=len(c))
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(nz, micro.shape[1]), pa.int64()),
                    "dim": pa.array(
                        np.tile(np.arange(micro.shape[1]), len(nz)), pa.int64()
                    ),
                    "vsum": pa.array(sums[nz].ravel()),
                    "n": pa.array(
                        np.repeat(counts[nz], micro.shape[1]).astype(np.int64)
                    ),
                }
            )

        partials = ds.map_batches(assign_and_sum, batch_format="pyarrow")
        if merge == "driver":
            # |blocks| × k × dim partial rows land on the driver — the
            # right call while that product is megabytes (saves one
            # shuffle per round, measured ~1.5s); use "distributed"
            # when |blocks| × k × dim is large (10^5+ blocks).
            merged = (
                partials.to_pandas()
                .groupby(["cluster", "dim"], as_index=False)[["vsum", "n"]]
                .sum()
                .sort_values(["cluster", "dim"])
            )
        else:
            merged = (
                grouped_agg(
                    partials,
                    ["cluster", "dim"],
                    {"vsum": ("vsum", "sum"), "n": ("n", "sum")},
                )
                .to_pandas()
                .sort_values(["cluster", "dim"])
            )
        new = cents.copy()  # empty clusters keep their centroid
        for c, sub in merged.groupby("cluster"):
            new[int(c)] = (
                sub["vsum"].to_numpy(dtype=np.float64)
                / 1000000.0
                / sub["n"].to_numpy(dtype=np.float64)
            )
        if np.array_equal(new, cents):
            return cents, it
        cents = new
    return cents, max_iters


def assign_clusters(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Adds a ``cluster`` column (argmin squared-L2 against the
    broadcast centroids) — the final labeling pass once ``kmeans``
    has converged."""
    import ray

    cents = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.c = ray.get(ref)
            self.c_sq = (self.c * self.c).sum(axis=1)

        def __call__(self, b: pa.Table) -> pa.Table:
            v = _flat_vectors(b[vec_col])
            if v.size == 0:
                return b.append_column("cluster", pa.array([], pa.int64()))
            d = self.c_sq[None, :] - 2.0 * (v @ self.c.T)
            return b.append_column(
                "cluster", pa.array(np.argmin(d, axis=1).astype(np.int64))
            )

    return bcast_stage(ds, Assign, cents.nbytes)
