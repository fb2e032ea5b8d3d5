"""s-t maximum flow / minimum cut — Edmonds-Karp (Edmonds & Karp
1972): BFS shortest augmenting paths on integer capacities, O(V·E²)
and fully deterministic with ascending-neighbour BFS order. The
min-cut certificate returned is the residual-reachable source side —
the unique LATTICE-MINIMAL min cut (contained in every other min
cut), which is exactly what the oracle's exhaustive enumeration
picks with its (capacity, |S|) argmin. Max-flow = min-cut duality
makes the enumeration a ground-truth check, not an algorithm replay.

100-TB shape: capacities are the bounded output of the trade count
combiner (ops/mis.py discipline); the augmenting loop closes on the
bounded matrix. Flow/cut is the bottleneck/partition audit for
routing and pipeline-capacity planning."""

from __future__ import annotations

from collections import deque

import pandas as pd


def edmonds_karp(
    cap: dict[tuple[int, int], int], nodes: list[int], s: int, t: int
) -> tuple[int, set[int]]:
    """Max flow s->t over integer capacities. Returns (flow_value,
    source_side) where source_side is the residual-reachable set —
    the minimal min cut."""
    res = dict(cap)
    adj: dict[int, list[int]] = {v: [] for v in nodes}
    for (u, v) in cap:
        if v not in adj[u]:
            adj[u].append(v)
        if u not in adj[v]:
            adj[v].append(u)  # residual back-arc
    for v in adj:
        adj[v].sort()
    flow = 0
    while True:
        # BFS for a shortest augmenting path
        parent: dict[int, int] = {s: s}
        q = deque([s])
        while q and t not in parent:
            u = q.popleft()
            for v in adj[u]:
                if v not in parent and res.get((u, v), 0) > 0:
                    parent[v] = u
                    q.append(v)
        if t not in parent:
            break
        # bottleneck
        b = None
        v = t
        while v != s:
            u = parent[v]
            c = res.get((u, v), 0)
            b = c if b is None else min(b, c)
            v = u
        v = t
        while v != s:
            u = parent[v]
            res[(u, v)] = res.get((u, v), 0) - b
            res[(v, u)] = res.get((v, u), 0) + b
            v = u
        flow += b
    reach = {s}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in reach and res.get((u, v), 0) > 0:
                reach.add(v)
                q.append(v)
    return flow, reach


def min_cut_table(edges: pd.DataFrame) -> pd.DataFrame:
    """Per-node min-cut audit over a directed capacity edge list
    (``src``, ``dst``, ``cap``; self-loops dropped, parallel arcs
    summed). Source = smallest node, sink = largest. Returns
    ``(node, source_side, max_flow)`` sorted by node."""
    cap: dict[tuple[int, int], int] = {}
    for u, v, c in zip(
        edges["src"].astype(int), edges["dst"].astype(int), edges["cap"].astype(int)
    ):
        if u != v:
            cap[(u, v)] = cap.get((u, v), 0) + c
    nodes = sorted({x for e in cap for x in e})
    if len(nodes) < 2:
        return pd.DataFrame(
            {"node": nodes, "source_side": [1] * len(nodes), "max_flow": [0] * len(nodes)}
        ).astype("int64")
    s, t = nodes[0], nodes[-1]
    flow, side = edmonds_karp(cap, nodes, s, t)
    return pd.DataFrame(
        {
            "node": nodes,
            "source_side": [1 if v in side else 0 for v in nodes],
            "max_flow": [flow] * len(nodes),
        }
    ).astype("int64")
