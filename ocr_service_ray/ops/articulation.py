"""Articulation points and bridges — Hopcroft-Tarjan low-link DFS
(Tarjan 1974): a single linear pass computes, for every vertex, how
many extra connected components its removal creates, and for every
edge whether it is a bridge. The classic single-point-of-failure
audit for infrastructure/graph-connectivity analysis.

Determinism contract (the SQL oracle verifies it with an INDEPENDENT
algorithm — brute-force remove-and-recount via recursive-CTE
reachability closures, no DFS anywhere):
  comp_delta(v)     = components(G - v) - components(G)
  is_articulation(v)= 1 iff comp_delta(v) > 0
  bridge_deg(v)     = number of incident edges whose removal
                      disconnects their endpoints

100-TB shape: the graph is the bounded output of the trade count
combiner (the only big-data phase — ops/mis.py discipline); the
linear DFS closes on the bounded edge list. Engine is O(V+E)
low-link; the oracle is O(V·E) per removal — two algorithms, one
answer."""

from __future__ import annotations

import pandas as pd


def _tarjan(adj: dict[int, list[int]], nodes: list[int]):
    """Iterative low-link DFS. Returns (n_children, child_split,
    bridges, roots) where child_split[v] counts DFS children c with
    low[c] >= disc[v]."""
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    n_children = {v: 0 for v in nodes}
    child_split = {v: 0 for v in nodes}
    bridges: set[tuple[int, int]] = set()
    roots: set[int] = set()
    t = 0
    for root in nodes:
        if root in disc:
            continue
        roots.add(root)
        disc[root] = low[root] = t
        t += 1
        stack: list[tuple[int, int | None, object]] = [(root, None, iter(adj[root]))]
        while stack:
            v, p, it = stack[-1]
            advanced = False
            for u in it:
                if u == p:
                    continue
                if u in disc:
                    if disc[u] < low[v]:
                        low[v] = disc[u]
                else:
                    disc[u] = low[u] = t
                    t += 1
                    n_children[v] += 1
                    stack.append((u, v, iter(adj[u])))
                    advanced = True
                    break
            if not advanced:
                stack.pop()
                if p is not None:
                    if low[v] < low[p]:
                        low[p] = low[v]
                    if low[v] > disc[p]:
                        bridges.add((min(p, v), max(p, v)))
                    if low[v] >= disc[p]:
                        child_split[p] += 1
    return n_children, child_split, bridges, roots


def articulation_bridges(edges: pd.DataFrame) -> pd.DataFrame:
    """Per-node cut-vertex/bridge audit over an undirected graph
    given as an edge DataFrame (``src``, ``dst``; symmetrized,
    deduped, self-loops dropped). Returns ``(node, degree,
    is_articulation, comp_delta, bridge_deg)`` sorted by node.

    Removing vertex v splits its component into k parts:
    k = n_dfs_children(v) at a DFS root, else 1 + #{children c:
    low(c) >= disc(v)}; comp_delta = k - 1 (no isolated nodes here —
    every node arrives on an edge)."""
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    adj: dict[int, list[int]] = {}
    for a, b in sorted(pairs):
        adj.setdefault(a, []).append(b)
    nodes = sorted(adj)
    n_children, child_split, bridges, roots = _tarjan(adj, nodes)
    bdeg = {v: 0 for v in nodes}
    for a, b in bridges:
        bdeg[a] += 1
        bdeg[b] += 1
    rows = []
    for v in nodes:
        k = n_children[v] if v in roots else 1 + child_split[v]
        delta = k - 1
        rows.append((v, len(adj[v]), 1 if delta > 0 else 0, delta, bdeg[v]))
    return pd.DataFrame(
        rows,
        columns=["node", "degree", "is_articulation", "comp_delta", "bridge_deg"],
    ).astype("int64")
