"""Natural-loop detection — the dominance-based loop finder of
compiler theory (Aho-Sethi-Ullman §9.6): a BACK EDGE is an arc
u -> h whose head h dominates its tail u; its natural loop is h
plus every node that reaches u without passing h. In dataflow
graphs: the feedback structures through which flow can cycle, keyed
by the stage that gates them.

Engine: dominance via ops/dominators.py (CHK fixpoint), back edges
by the dominance test, bodies via backward closure with h removed.
Oracle: dominance from remove-and-reach closures + its own backward
closure — the two dominance algorithms differ, the loop definition
is shared.

Contract: root = smallest node; loops reported per header with the
merged body over all its back edges; rows (header, n_back_edges,
body_size) sorted.

100-TB shape: bounded combiner digraph; closes on it."""

from __future__ import annotations

import pandas as pd


def natural_loops(edges: pd.DataFrame) -> pd.DataFrame:
    from ocr_service_ray.ops.dominators import dominance_relation

    arcs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(edges["src"], edges["dst"])
            if int(a) != int(b)
        }
    )
    dom = dominance_relation(edges)
    dom_pairs = set(zip(dom["node"], dom["dom"]))
    reachable = set(dom["node"])
    preds: dict[int, list[int]] = {}
    for a, b in arcs:
        if a in reachable and b in reachable:
            preds.setdefault(b, []).append(a)
    back = [
        (u, h)
        for u, h in arcs
        if u in reachable and h in reachable and (u, h) in dom_pairs
    ]
    loops: dict[int, set[int]] = {}
    nbe: dict[int, int] = {}
    for u, h in back:
        nbe[h] = nbe.get(h, 0) + 1
        body = loops.setdefault(h, {h})
        stack = [u]
        while stack:
            v = stack.pop()
            if v in body:
                continue
            body.add(v)
            for p in preds.get(v, ()):
                if p not in body:
                    stack.append(p)
    rows = [
        (h, nbe[h], len(loops[h])) for h in sorted(loops)
    ]
    return pd.DataFrame(
        rows, columns=["header", "n_back_edges", "body_size"]
    ).astype("int64")
