"""Stress centrality — Shimbel 1953: C(v) = number of shortest s-t
paths passing strictly through v, the pure-integer sibling of
betweenness (no fractions, so every count is exact and
SQL-replayable). High-stress nodes are the load-bearing relays of
the graph.

Determinism contract (oracle-replayed):
  distances: BFS capped at ``cap`` hops (fixed-budget unrolled-round
  discipline of ops/centrality.py — pairs farther than cap are
  excluded by contract);
  sigma(s,v) = number of shortest s->v paths (DAG-restricted walk
  count);
  stress(v)  = sum over unordered pairs {s,t}, s != v != t, with
  d(s,t) <= cap of sigma(s,v)*sigma(v,t) when
  d(s,v) + d(v,t) = d(s,t).

100-TB shape: the graph is the bounded trade-count combiner output;
per-source BFS + path-count DP close on the bounded adjacency
(ops/mis.py discipline)."""

from __future__ import annotations

from collections import deque

import pandas as pd


def _bfs_sigma(adj: dict[int, list[int]], s: int, cap: int):
    dist = {s: 0}
    sigma = {s: 1}
    q = deque([s])
    while q:
        u = q.popleft()
        if dist[u] >= cap:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                sigma[v] = 0
                q.append(v)
            if dist[v] == dist[u] + 1:
                sigma[v] += sigma[u]
    return dist, sigma


def stress_centrality(edges: pd.DataFrame, cap: int = 6) -> pd.DataFrame:
    """Per-node stress over an undirected graph (``src``, ``dst``;
    symmetrized/deduped, self-loops dropped). Returns ``(node,
    degree, stress)`` sorted by node."""
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    adj: dict[int, list[int]] = {}
    for a, b in sorted(pairs):
        adj.setdefault(a, []).append(b)
    nodes = sorted(adj)
    dist: dict[int, dict[int, int]] = {}
    sigma: dict[int, dict[int, int]] = {}
    for s in nodes:
        dist[s], sigma[s] = _bfs_sigma(adj, s, cap)
    stress = {v: 0 for v in nodes}
    for i, s in enumerate(nodes):
        for t in nodes[i + 1 :]:
            if t not in dist[s] or dist[s][t] > cap:
                continue
            dst_ = dist[s][t]
            for v in nodes:
                if v == s or v == t:
                    continue
                dv_s = dist[s].get(v)
                dv_t = dist[t].get(v)
                if dv_s is None or dv_t is None:
                    continue
                if dv_s + dv_t == dst_:
                    stress[v] += sigma[s][v] * sigma[t][v]
    return pd.DataFrame(
        {
            "node": nodes,
            "degree": [len(adj[v]) for v in nodes],
            "stress": [stress[v] for v in nodes],
        }
    ).astype("int64")
