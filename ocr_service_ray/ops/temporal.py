"""Temporal earliest-arrival paths — time-respecting reachability
over dated edges (Wu et al., VLDB 2014 "Path problems in temporal
graphs"; unlike static SSSP, an edge (u→v, t) is usable only if the
walker is AT u by time t, so static shortest-path answers are wrong
on temporal networks — the canonical information/contagion-flow
model).

Fixed-round label correction (the sssp/pagerank unrolled-round
discipline): round r relaxes ``arr[v] = min(arr[v], min over edges
(u→v, t) with t >= arr[u] of t)``; R rounds bound the admissible
hop count, converged rounds are no-ops, and the oracle unrolls the
same R rounds as a CTE chain — exact integers (day numbers), no
floats.

100-TB shape: the arrival vector is |nodes|-bounded broadcast state;
each round is ONE streamed edge scan + per-node min combiner — raw
edges never reach the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

UNREACHED = 1 << 60


def earliest_arrival(
    edges_ds, source: int, rounds: int = 4
) -> pd.DataFrame:
    """Earliest-arrival day per node from ``source`` (start time 0)
    over a Dataset of directed dated edges (``src``, ``dst``, ``t``
    int64). Returns ``(node, arrival, reached)`` — arrival = -1 on
    the unreached sentinel, ``reached`` the 0/1 flag."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    edges = edges_ds.materialize()

    def nodes_of(b: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    b["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        return pa.table({"node": pa.array(u)})

    nodes = sorted(
        {int(r["node"]) for r in edges.map_batches(nodes_of, batch_format="pyarrow").take_all()}
    )
    arr = {v: UNREACHED for v in nodes}
    arr[source] = 0

    for _ in range(rounds):
        ref = ray.put(dict(arr))

        def relax(b: pa.Table, ref=ref) -> pa.Table:
            a = ray.get(ref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            t = b["t"].to_numpy(zero_copy_only=False).astype(np.int64)
            av = np.array([a[int(x)] for x in s], dtype=np.int64)
            ok = t >= av  # time-respecting: depart no earlier than arrival
            return pa.table(
                {
                    "node": pa.array(d[ok]),
                    "cand": pa.array(t[ok]),
                }
            )

        m = grouped_agg(
            edges.map_batches(relax, batch_format="pyarrow"),
            ["node"],
            {"c": ("cand", "min")},
        ).to_pandas()
        if "node" in m.columns:
            for _, row in m.iterrows():
                v, c = int(row["node"]), int(row["c"])
                if c < arr[v]:
                    arr[v] = c

    return pd.DataFrame(
        {
            "node": pd.array(nodes, dtype="int64"),
            "arrival": pd.array(
                [arr[v] if arr[v] != UNREACHED else -1 for v in nodes],
                dtype="int64",
            ),
            "reached": pd.array(
                [1 if arr[v] != UNREACHED else 0 for v in nodes],
                dtype="int64",
            ),
        }
    )
