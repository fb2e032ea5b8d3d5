"""Label propagation community detection — synchronous LPA with
deterministic tie-breaks (Raghavan, Albert & Kumara 2007; the
near-linear community detector: each node adopts its neighbourhood's
majority label, communities emerge as label fixpoints).

Determinism contract (replayed by the oracle): labels start as node
ids; every round ALL nodes update simultaneously (Jacobi) to the
label with the highest neighbour count, ties to the SMALLEST label;
isolated/degree-0 nodes keep their label. A fixed round budget keeps
engine and oracle in lockstep even on the bipartite oscillations
synchronous LPA is known for — both sides oscillate identically, so
parity is unconditional.

100-TB shape: the label map is |nodes|-bounded broadcast state; each
round is ONE symmetrized edge scan emitting (node, nbr_label) pairs
into a (node, label)-count combiner, argmax closed on the bounded
count table — raw edges never reach the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def label_propagation(edges_ds, rounds: int = 4) -> pd.DataFrame:
    """LPA over an undirected edge Dataset (``src``/``dst``; any
    orientation, symmetrized internally, self-loops dropped).
    Returns one row per node: ``(node, label, community_size)``."""
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
    label = {v: v for v in nodes}

    for _ in range(rounds):
        ref = ray.put(dict(label))

        def emit(b: pa.Table, ref=ref) -> pa.Table:
            lm = ray.get(ref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = s != d
            s, d = s[keep], d[keep]
            ls = np.array([lm[int(x)] for x in s], dtype=np.int64)
            ld = np.array([lm[int(x)] for x in d], dtype=np.int64)
            return pa.table(
                {
                    "node": pa.array(np.concatenate([s, d])),
                    "nl": pa.array(np.concatenate([ld, ls])),
                }
            )

        cnt = grouped_agg(
            edges.map_batches(emit, batch_format="pyarrow"),
            ["node", "nl"],
            {"c": (None, "count")},
        ).to_pandas()
        if cnt.empty or "node" not in cnt.columns:
            break
        cnt = cnt.sort_values(
            ["node", "c", "nl"], ascending=[True, False, True]
        )
        best = cnt.groupby("node").first().reset_index()
        new = dict(label)
        for _, row in best.iterrows():
            new[int(row["node"])] = int(row["nl"])
        label = new

    sizes: dict[int, int] = {}
    for v in nodes:
        sizes[label[v]] = sizes.get(label[v], 0) + 1
    return pd.DataFrame(
        {
            "node": pd.array(nodes, dtype="int64"),
            "label": pd.array([label[v] for v in nodes], dtype="int64"),
            "community_size": pd.array(
                [sizes[label[v]] for v in nodes], dtype="int64"
            ),
        }
    )
