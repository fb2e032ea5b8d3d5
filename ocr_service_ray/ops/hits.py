"""Integer-exact HITS (hubs & authorities, fixed-round power
iteration) — the bipartite-flavored companion to ``ops/pagerank.py``:
hubs are nodes that POINT AT good authorities, authorities are nodes
pointed at BY good hubs (Kleinberg's mutual recursion). On a crawl /
citation graph the authority score ranks link targets, the hub score
ranks link aggregators — both feed source weighting in a pretraining
mix the same way PageRank does.

100-TB shape (identical to pagerank): per half-round the score
vector is BROADCAST via ``ray.put`` (|nodes|-bounded), ONE
``map_batches`` scan over the edge Dataset computes per-edge integer
products collapsed to per-endpoint partial sums, and a
|nodes|-bounded combiner closes the half-round. Edges never shuffle;
raw edge rows never reach the driver.

Exact-integer discipline (SQL-reproducible, layout-invariant):

- scores are ppm-scaled int64, hubs initialized to SCALE;
- a half-round folds exact integer products ``score[u] * w`` (no
  per-edge division, so block layout cannot matter: integer addition
  is associative);
- each half-round closes with SUM-normalization
  ``x' = (SCALE * x_raw) // Σ x_raw`` — floor-div on non-negative
  integers, identical under DuckDB truncation;
- ``iters`` is fixed so the oracle can unroll the half-rounds as a
  CTE chain (the ops/kmeans.py / ops/pagerank.py contract). Nodes
  with no in-edges get authority 0, no out-edges get hub 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["hits"]

SCALE = 1_000_000


def hits(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 2,
):
    """pandas ``(node, hub_ppm, auth_ppm)`` over the union of src/dst
    nodes, sorted by node. ``edges_ds`` must be re-scannable cheaply
    (parquet-backed or materialized — caller-owned, as in
    ops/kmeans.py); each half-round is one scan."""
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

    srcs = grouped_agg(edges, ["src"], {"_n": (None, "count")}).to_pandas()
    dsts = grouped_agg(edges, ["dst"], {"_n": (None, "count")}).to_pandas()
    nodes = np.union1d(
        srcs["src"].to_numpy(dtype=np.int64), dsts["dst"].to_numpy(dtype=np.int64)
    )
    idx = {int(v): i for i, v in enumerate(nodes)}
    idx_ref = ray.put(idx)

    def _half_round(score: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """raw[to] = Σ_edges score[from] * w, then sum-normalize."""
        s_ref = ray.put(score)

        def contrib(batch: pa.Table) -> pa.Table:
            import ray as _ray

            ix = _ray.get(idx_ref)
            s = _ray.get(s_ref)
            frm = batch[from_col].to_numpy(zero_copy_only=False)
            fi = np.array([ix[int(v)] for v in frm], dtype=np.int64)
            c = s[fi] * batch["w"].to_numpy(zero_copy_only=False)
            return pa.table({"node": batch[to_col], "c": pa.array(c)})

        raw = grouped_agg(
            edges.map_batches(contrib, batch_format="pyarrow"),
            ["node"],
            {"s": ("c", "sum")},
        ).to_pandas()
        new = np.zeros(len(nodes), dtype=np.int64)
        for n, s in zip(raw["node"], raw["s"]):
            new[idx[int(n)]] = int(s)
        tot = int(sum(int(x) for x in new))
        if tot == 0:
            return new
        # Python-int normalization: SCALE * raw can exceed int64 for
        # heavy weight totals; |nodes| is tiny so the loop is free.
        return np.array(
            [(SCALE * int(x)) // tot for x in new], dtype=np.int64
        )

    hub = np.full(len(nodes), SCALE, dtype=np.int64)
    auth = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        auth = _half_round(hub, "src", "dst")
        hub = _half_round(auth, "dst", "src")

    return (
        pd.DataFrame(
            {
                "node": nodes.astype("int64"),
                "hub_ppm": hub,
                "auth_ppm": auth,
            }
        )
        .sort_values("node")
        .reset_index(drop=True)
    )
