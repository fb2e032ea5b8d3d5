"""Integer-exact PageRank (fixed-round power iteration) — the link
/ citation / reference-graph importance score a pretraining pipeline
uses to weight crawl sources (Common-Crawl-style harmonic/PageRank
source ranking), expressed as Ray Data rounds over an edge Dataset.

Per round (100 TB shape): the rank vector is BROADCAST via ``ray.put``
(|nodes|-bounded — the kmeans-centroid contract: node vocabulary fits
a worker heap; for a node set beyond that, key the rank table by node
and use a hash join per round instead — the same broadcast/shuffle
pairing as ``ops/ranking.py``); ONE ``map_batches`` pass over edges
computes per-edge integer contributions and collapses each block to
per-dst partial sums; one |nodes|-bounded combiner merge closes the
round. Edges never shuffle; raw edge rows never reach the driver.

Exact-integer discipline (SQL-reproducible, layout-invariant):

- ranks are ppm-scaled int64 (SCALE = 1e6), initialized to SCALE;
- per-edge contribution ``(r[src] * w) // outw[src]`` — floor div
  BEFORE the sum, so block layout cannot change the result (integer
  addition is associative);
- update ``r'[v] = (15 * SCALE) // 100 + (85 * inflow[v]) // 100``;
- dangling nodes (no out-edges) leak their mass (the standard
  simplification — no global dangling-sum redistribution term), and
  nodes with no in-edges sit at the damping floor. ``iters`` is fixed
  (not convergence-tested) so the oracle can unroll the rounds as a
  CTE chain — the ``ops/kmeans.py`` contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pagerank"]

SCALE = 1_000_000


def pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 3,
):
    """pandas ``(node, rank_ppm)`` over the union of src/dst nodes,
    sorted by node. ``edges_ds`` must be re-scannable cheaply (parquet
    -backed or materialized — the caller-owned choice, as in
    ``ops/kmeans.py``); each round is one scan."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    def project(batch: pa.Table) -> pa.Table:
        w = (
            batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if weight_col
            else np.ones(batch.num_rows, dtype=np.int64)
        )
        return pa.table(
            {
                "src": batch[src_col].cast(pa.int64()),
                "dst": batch[dst_col].cast(pa.int64()),
                "w": pa.array(w),
            }
        )

    edges = edges_ds.map_batches(project, batch_format="pyarrow")

    outw = grouped_agg(edges, ["src"], {"outw": ("w", "sum")}).to_pandas()
    dsts = grouped_agg(edges, ["dst"], {"_n": (None, "count")}).to_pandas()
    nodes = np.union1d(
        outw["src"].to_numpy(dtype=np.int64), dsts["dst"].to_numpy(dtype=np.int64)
    )
    idx = {int(v): i for i, v in enumerate(nodes)}
    outw_arr = np.zeros(len(nodes), dtype=np.int64)
    for s, ow in zip(outw["src"], outw["outw"]):
        outw_arr[idx[int(s)]] = int(ow)

    rank = np.full(len(nodes), SCALE, dtype=np.int64)
    nodes_ref = ray.put(idx)
    outw_ref = ray.put(outw_arr)

    for _ in range(iters):
        r_ref = ray.put(rank)

        def contrib(batch: pa.Table) -> pa.Table:
            import ray as _ray

            ix = _ray.get(nodes_ref)
            r = _ray.get(r_ref)
            ow = _ray.get(outw_ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            si = np.array([ix[int(v)] for v in src], dtype=np.int64)
            c = (r[si] * batch["w"].to_numpy(zero_copy_only=False)) // ow[si]
            return pa.table({"dst": batch["dst"], "c": pa.array(c)})

        inflow = grouped_agg(
            edges.map_batches(contrib, batch_format="pyarrow"),
            ["dst"],
            {"inflow": ("c", "sum")},
        ).to_pandas()
        new = np.full(len(nodes), (15 * SCALE) // 100, dtype=np.int64)
        for d, f in zip(inflow["dst"], inflow["inflow"]):
            new[idx[int(d)]] += (85 * int(f)) // 100
        rank = new

    return (
        pd.DataFrame({"node": nodes.astype("int64"), "rank_ppm": rank})
        .sort_values("node")
        .reset_index(drop=True)
    )
