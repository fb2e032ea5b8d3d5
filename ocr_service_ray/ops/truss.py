"""k-truss extraction — triangle-support edge peeling (Cohen 2008;
the cohesive-subgraph standard stricter than k-core: every surviving
edge must sit in ≥ k−2 triangles of the surviving subgraph, so
trusses are the community-core filter used on follow/trade graphs).

Fixed-round peeling (the MIS/sssp lockstep discipline): each round
computes per-edge support — |N(u) ∩ N(v)| within the CURRENT edge
set — and drops edges below k−2; converged rounds are no-ops, so
running exactly R rounds keeps engine and the R-unrolled oracle
byte-identical whether or not the peel finished earlier (peeling is
monotone: supports only shrink, dropped edges never return).

100-TB shape: the edge set here is the |nations|²-bounded combiner
output, broadcast as an adjacency map per round (the bellman_ford
bound discipline); at web scale each round is the triangles.py
wedge-join pipeline (edge scan + per-edge count combiner) — the
semantics, peeled fixed rounds, are unchanged."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def k_truss(edges_ds, k: int = 4, rounds: int = 5) -> pd.DataFrame:
    """k-truss of an undirected graph (edge Dataset ``src``/``dst``,
    any orientation; canonicalized + deduped internally). Runs
    exactly ``rounds`` peel rounds. Returns surviving edges
    ``(lo, hi, support)`` with support measured in the final
    subgraph, sorted."""
    import ray

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "lo": pa.array(np.minimum(s, d)),
                "hi": pa.array(np.maximum(s, d)),
            }
        )

    from ocr_service_ray.ops.agg import grouped_agg

    cur = (
        grouped_agg(
            edges_ds.map_batches(canon, batch_format="pyarrow"),
            ["lo", "hi"],
            {"_c": (None, "count")},
        )
        .drop_columns(["_c"])
        .materialize()
    )

    def support_pass(ds):
        """Per-edge |N(u) ∩ N(v)| against the broadcast adjacency."""
        adj: dict[int, set] = {}
        for r in ds.take_all():
            a, b = int(r["lo"]), int(r["hi"])
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        ref = ray.put(adj)

        def sup(b: pa.Table, ref=ref) -> pa.Table:
            am = ray.get(ref)
            lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            s = [
                len(am.get(int(u), set()) & am.get(int(v), set()))
                for u, v in zip(lo, hi)
            ]
            return pa.table(
                {
                    "lo": b["lo"],
                    "hi": b["hi"],
                    "support": pa.array(s, pa.int64()),
                }
            )

        return ds.map_batches(sup, batch_format="pyarrow")

    thr = k - 2
    for _ in range(rounds):
        with_sup = support_pass(cur)

        def keep(b: pa.Table, thr=thr) -> pa.Table:
            m = b["support"].to_numpy(zero_copy_only=False) >= thr
            return pa.table({"lo": b["lo"].filter(pa.array(m)), "hi": b["hi"].filter(pa.array(m))})

        cur = with_sup.map_batches(keep, batch_format="pyarrow").materialize()

    out = support_pass(cur).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "lo": pd.array([], dtype="int64"),
                "hi": pd.array([], dtype="int64"),
                "support": pd.array([], dtype="int64"),
            }
        )
    return (
        out.sort_values(["lo", "hi"])
        .reset_index(drop=True)
        .astype("int64")
    )
