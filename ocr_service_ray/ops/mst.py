"""Distributed minimum spanning forest — Borůvka rounds over an edge
Dataset.

Borůvka (1926; the standard distributed MST — GraphFrames, PBGL,
Pregel all use it) converges in <= ceil(log2 n) rounds: every round
each component selects its minimum-weight outgoing edge, the selected
edges merge components, intra-component edges drop out. With UNIQUE
edge weights the MST/MSF is unique, so the selected edge SET is
deterministic and engine-comparable (Kruskal in the SQL oracle picks
the same edges).

100-TB shape: the edge table only ever participates in streamed
map_batches scans and one grouped-min combiner per round — raw edges
never reach the driver. Per round the driver sees exactly the
<=|components| selected minimum weights (Borůvka's contraction input,
the same |groups|-bounded discipline as sssp/pagerank); the node→
component map is broadcast via ``ray.put`` (|nodes|-bounded — the
documented assumption, same as bellman_ford's distance vector; a
join-based labeling is the escape hatch when nodes outgrow broadcast).

Reference semantics anchor: the reference has no graph engine; this is
part of the beyond-reference LLM-curation family (SURVEY §2.11), where
connected components (ops/graph.py) already serve dedup — MST adds the
weighted-contraction variant (single-linkage clustering over similarity
edges)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _find(parent: dict, x):
    # path-halving union-find on the driver's component map
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x


def boruvka_msf(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    max_rounds: int = 64,
):
    """Minimum spanning forest of an undirected graph given as an edge
    Dataset (one row per edge; weights MUST be unique positive int64 —
    asserted per batch — which makes the forest unique).

    Returns a dict of exact integers:
    ``n_nodes, n_edges, n_components, msf_edges, msf_weight,
    edge_checksum`` where ``edge_checksum`` is the sum over chosen
    edges of ``min(src,dst) * 100003 + max(src,dst)`` (an order-free
    fingerprint of the edge SET, cross-checkable in SQL)."""
    import ray

    edges = edges_ds.materialize()  # re-scanned once per round

    # node universe + edge count: one combiner scan
    def nodes_of(b: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    b[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        return pa.table({"node": pa.array(u)})

    node_parts = edges.map_batches(nodes_of, batch_format="pyarrow").take_all()
    nodes = sorted({int(r["node"]) for r in node_parts})
    n_edges = edges.count()

    parent = {v: v for v in nodes}
    msf_w = 0
    msf_edges = 0
    checksum = 0
    chosen_weights: set[int] = set()

    for _ in range(max_rounds):
        comp = {v: _find(parent, v) for v in nodes}
        comp_ref = ray.put(comp)

        # per-component minimum outgoing weight (weights unique ->
        # the min w IS the edge identity; endpoints recovered in the
        # same pass by packing them alongside as argmin payload)
        def out_edges(b: pa.Table, comp_ref=comp_ref) -> pa.Table:
            cm = ray.get(comp_ref)
            s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            w = b[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(w) != len(np.unique(w)):
                raise ValueError("boruvka_msf requires unique edge weights")
            cs = np.array([cm[int(x)] for x in s], dtype=np.int64)
            cd = np.array([cm[int(x)] for x in d], dtype=np.int64)
            keep = cs != cd
            s, d, w, cs, cd = s[keep], d[keep], w[keep], cs[keep], cd[keep]
            # each crossing edge is a candidate for BOTH endpoint comps
            return pa.table(
                {
                    "comp": pa.array(np.concatenate([cs, cd])),
                    "w": pa.array(np.concatenate([w, w])),
                    "u": pa.array(np.concatenate([s, s])),
                    "v": pa.array(np.concatenate([d, d])),
                }
            )

        cand = edges.map_batches(out_edges, batch_format="pyarrow")
        # block-local per-comp argmin, then a tiny driver close over
        # <=|comps| rows per block (argmin is not a grouped_agg
        # primitive; partials stay |comps|-bounded per block)
        def block_min(b: pa.Table) -> pa.Table:
            import pandas as pd

            df = b.to_pandas()
            if df.empty:
                return pa.table(
                    {c: pa.array([], type=pa.int64()) for c in ("comp", "w", "u", "v")}
                )
            idx = df.groupby("comp")["w"].idxmin()
            return pa.Table.from_pandas(
                df.loc[idx, ["comp", "w", "u", "v"]], preserve_index=False
            )

        part = cand.map_batches(block_min, batch_format="pyarrow").to_pandas()
        if part.empty:
            break
        sel = part.loc[part.groupby("comp")["w"].idxmin()]

        merged_any = False
        for _, row in sel.sort_values("w").iterrows():
            ru, rv = _find(parent, int(row["u"])), _find(parent, int(row["v"]))
            if ru == rv:
                continue
            parent[max(ru, rv)] = min(ru, rv)
            wv = int(row["w"])
            if wv not in chosen_weights:  # both comps may pick same edge
                chosen_weights.add(wv)
                msf_w += wv
                msf_edges += 1
                lo, hi = sorted((int(row["u"]), int(row["v"])))
                checksum += lo * 100003 + hi
            merged_any = True
        if not merged_any:
            break

    n_comp = len({_find(parent, v) for v in nodes})
    return {
        "n_nodes": len(nodes),
        "n_edges": int(n_edges),
        "n_components": n_comp,
        "msf_edges": msf_edges,
        "msf_weight": msf_w,
        "edge_checksum": checksum,
    }
