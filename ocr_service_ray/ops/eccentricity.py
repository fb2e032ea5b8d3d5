"""Graph eccentricity, center and periphery — the classical distance
invariants (Harary): ecc(v) = max shortest-path distance from v,
radius = min ecc, diameter = max ecc; center/periphery are the
argmin/argmax sets. BFS capped at ``cap`` hops (the fixed-budget
contract of ops/centrality.py / ops/stress.py); nodes beyond the
cap are reported in ``n_far`` instead of poisoning the max.

100-TB shape: the graph is the bounded trade combiner output;
per-source BFS closes on it. The oracle recomputes distances with
6 unrolled min-relaxation rounds — no BFS anywhere."""

from __future__ import annotations

from collections import deque

import pandas as pd


def eccentricity_table(edges: pd.DataFrame, cap: int = 6) -> pd.DataFrame:
    """(node, degree, ecc, n_far, is_center, is_periphery) over the
    symmetrized graph; ecc is the max distance over nodes reachable
    within ``cap``; n_far counts the rest (self excluded)."""
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    adj: dict[int, list[int]] = {}
    for a, b in sorted(pairs):
        adj.setdefault(a, []).append(b)
    nodes = sorted(adj)
    ecc = {}
    far = {}
    for s in nodes:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= cap:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        ecc[s] = max(dist.values())
        far[s] = len(nodes) - len(dist)
    radius = min(ecc.values())
    diameter = max(ecc.values())
    return pd.DataFrame(
        {
            "node": nodes,
            "degree": [len(adj[v]) for v in nodes],
            "ecc": [ecc[v] for v in nodes],
            "n_far": [far[v] for v in nodes],
            "is_center": [1 if ecc[v] == radius else 0 for v in nodes],
            "is_periphery": [1 if ecc[v] == diameter else 0 for v in nodes],
        }
    ).astype("int64")
