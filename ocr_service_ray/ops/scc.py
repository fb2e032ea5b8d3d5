"""Strongly connected components — Tarjan's one-pass SCC algorithm
(Tarjan 1972): linear-time low-link DFS partitioning a DIRECTED
graph into its maximal mutually-reachable vertex sets. The cycle /
feedback-structure audit for directed flow graphs (who trades with
whom in both directions, dependency loops, circular references).

Determinism contract (the SQL oracle verifies it with an INDEPENDENT
algorithm — transitive-closure + mutual-reachability join, no DFS):
  scc_id(v)  = min node mutually reachable with v (including v)
  scc_size   = |component|
  in_cycle   = 1 iff scc_size > 1 (self-loops dropped at build)

100-TB shape: the digraph is the bounded output of the trade count
combiner (ops/mis.py discipline — the lineitem joins are the only
big-data phase); the linear DFS closes on the bounded edge list.
Engine O(V+E) vs oracle O(V²·E) closure — two algorithms, one
answer."""

from __future__ import annotations

import pandas as pd


def tarjan_scc(edges: pd.DataFrame) -> pd.DataFrame:
    """SCCs of a directed graph given as an edge DataFrame (``src``,
    ``dst``; deduped, self-loops dropped). Returns one row per node:
    ``(node, scc_id, scc_size, in_cycle)`` sorted by node."""
    arcs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            arcs.add((a, b))
    adj: dict[int, list[int]] = {}
    nodes_set = set()
    for a, b in sorted(arcs):
        adj.setdefault(a, []).append(b)
        nodes_set.add(a)
        nodes_set.add(b)
    nodes = sorted(nodes_set)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: dict[int, bool] = {}
    S: list[int] = []
    comp: dict[int, int] = {}
    t = 0
    for root in nodes:
        if root in index:
            continue
        index[root] = low[root] = t
        t += 1
        S.append(root)
        on_stack[root] = True
        stack: list[tuple[int, object]] = [(root, iter(adj.get(root, ())))]
        while stack:
            v, it = stack[-1]
            advanced = False
            for u in it:
                if u not in index:
                    index[u] = low[u] = t
                    t += 1
                    S.append(u)
                    on_stack[u] = True
                    stack.append((u, iter(adj.get(u, ()))))
                    advanced = True
                    break
                elif on_stack.get(u):
                    if index[u] < low[v]:
                        low[v] = index[u]
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    if low[v] < low[p]:
                        low[p] = low[v]
                if low[v] == index[v]:
                    members = []
                    while True:
                        w = S.pop()
                        on_stack[w] = False
                        members.append(w)
                        if w == v:
                            break
                    cid = min(members)
                    for w in members:
                        comp[w] = cid
    sizes: dict[int, int] = {}
    for v in nodes:
        sizes[comp[v]] = sizes.get(comp[v], 0) + 1
    rows = [
        (v, comp[v], sizes[comp[v]], 1 if sizes[comp[v]] > 1 else 0)
        for v in nodes
    ]
    return pd.DataFrame(
        rows, columns=["node", "scc_id", "scc_size", "in_cycle"]
    ).astype("int64")
