"""Condensation DAG + topological layering — contract every strongly
connected component (ops/scc.py) to one node; the result is a DAG,
and the longest-path layer of each component is the canonical
dependency depth (build scheduling, pipeline staging, cascade
analysis of who-feeds-whom).

Determinism contract (oracle-replayed):
  scc_id     = min mutually-reachable node (ops/scc.py)
  layer      = 8 Jacobi rounds of
               layer(c) <- 0 if c has no predecessors
                           else 1 + max(layer(pred))
               starting from all-0 (converged rounds are no-ops; the
               fixed budget keeps engine and the unrolled-CTE oracle
               in lockstep — the labelprop/pagerank discipline)
  n_preds / n_succs = distinct condensation in/out neighbours

100-TB shape: the digraph is the bounded trade-count combiner
output; SCC + condensation close on the bounded edge list."""

from __future__ import annotations

import pandas as pd


def condensation_layers(edges: pd.DataFrame, rounds: int = 8) -> pd.DataFrame:
    """Returns one row per SCC of the directed graph (``src``,
    ``dst``): ``(scc_id, scc_size, layer, n_preds, n_succs)``."""
    from ocr_service_ray.ops.scc import tarjan_scc

    scc = tarjan_scc(edges)
    comp = dict(zip(scc["node"], scc["scc_id"]))
    sizes = (
        scc.groupby("scc_id")["node"].count().to_dict()
    )
    cedges = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a == b:
            continue
        ca, cb = comp[a], comp[b]
        if ca != cb:
            cedges.add((ca, cb))
    comps = sorted(sizes)
    preds: dict[int, list[int]] = {c: [] for c in comps}
    succs: dict[int, list[int]] = {c: [] for c in comps}
    for a, b in cedges:
        preds[b].append(a)
        succs[a].append(b)
    layer = {c: 0 for c in comps}
    for _ in range(rounds):
        layer = {
            c: (1 + max(layer[p] for p in preds[c])) if preds[c] else 0
            for c in comps
        }
    return pd.DataFrame(
        {
            "scc_id": comps,
            "scc_size": [sizes[c] for c in comps],
            "layer": [layer[c] for c in comps],
            "n_preds": [len(preds[c]) for c in comps],
            "n_succs": [len(succs[c]) for c in comps],
        }
    ).astype("int64")
