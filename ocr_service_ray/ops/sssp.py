"""Single-source shortest paths: fixed-round distributed Bellman-Ford.

The iterative-graph sibling of `ops/pagerank.py` (same contract): the
distance vector is |nodes|-bounded and BROADCAST via ``ray.put`` each
round (node vocabulary fits a worker heap; beyond that, key the
distance table by node and hash-join per round); ONE ``map_batches``
pass over the edge Dataset computes per-edge relaxation candidates
``dist[src] + w`` and collapses each block to per-dst partial mins;
one |nodes|-bounded combiner-min closes the round. Edges never
shuffle; raw edge rows never reach the driver.

Exactness discipline: integer weights, ``rounds`` is FIXED (not
convergence-tested) so the oracle can unroll the rounds as a CTE
chain — after k rounds dist[v] is exactly the shortest <=k-hop path
weight (the textbook Bellman-Ford invariant), deterministic whether
or not the graph has converged. Unreachable nodes report -1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bellman_ford_rounds"]

_INF = np.iinfo(np.int64).max // 4  # headroom: _INF + max_w cannot wrap


def bellman_ford_rounds(
    edges_ds,
    source: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
):
    """pandas ``(node, dist)`` over the union of src/dst nodes plus
    the source, sorted by node; dist = exact shortest <=rounds-hop
    weight from ``source``, -1 if unreachable within that horizon.
    ``edges_ds`` must be cheaply re-scannable (parquet-backed or
    materialized — caller-owned, as in ops/pagerank.py); each round
    is one scan."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch[src_col].cast(pa.int64()),
                "dst": batch[dst_col].cast(pa.int64()),
                "w": batch[weight_col].cast(pa.int64()),
            }
        )

    edges = edges_ds.map_batches(project, batch_format="pyarrow")

    srcs = grouped_agg(edges, ["src"], {"_n": (None, "count")}).to_pandas()
    dsts = grouped_agg(edges, ["dst"], {"_n": (None, "count")}).to_pandas()
    nodes = np.union1d(
        srcs["src"].to_numpy(dtype=np.int64),
        dsts["dst"].to_numpy(dtype=np.int64),
    )
    nodes = np.union1d(nodes, np.array([source], dtype=np.int64))
    idx = {int(v): i for i, v in enumerate(nodes)}

    dist = np.full(len(nodes), _INF, dtype=np.int64)
    dist[idx[int(source)]] = 0
    idx_ref = ray.put(idx)

    for _ in range(int(rounds)):
        d_ref = ray.put(dist)

        def relax(batch: pa.Table) -> pa.Table:
            import ray as _ray

            ix = _ray.get(idx_ref)
            d = _ray.get(d_ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            si = np.array([ix[int(v)] for v in src], dtype=np.int64)
            cand = d[si] + batch["w"].to_numpy(zero_copy_only=False)
            keep = d[si] < _INF
            return pa.table(
                {
                    "dst": batch["dst"].filter(pa.array(keep)),
                    "cand": pa.array(cand[keep]),
                }
            )

        inflow = grouped_agg(
            edges.map_batches(relax, batch_format="pyarrow"),
            ["dst"],
            {"best": ("cand", "min")},
        ).to_pandas()
        if inflow.empty or "dst" not in inflow.columns:
            # no relaxation candidate anywhere this round (source has
            # no out-edges yet): distances are already fixed
            continue
        new = dist.copy()
        for v, b in zip(inflow["dst"], inflow["best"]):
            i = idx[int(v)]
            if int(b) < new[i]:
                new[i] = int(b)
        dist = new

    out = pd.DataFrame(
        {
            "node": nodes.astype("int64"),
            "dist": np.where(dist >= _INF, -1, dist).astype("int64"),
        }
    )
    return out.sort_values("node").reset_index(drop=True)
