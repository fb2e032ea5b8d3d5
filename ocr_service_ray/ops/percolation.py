"""Targeted-attack percolation — Albert, Jeong & Barabási 2000:
remove hubs in degree order and watch the giant component collapse.
The robustness/attack-tolerance audit for any dependency or flow
graph. Removal order is fixed on the ORIGINAL degrees (degree DESC,
node ASC — the standard static-attack curve), so every step is
deterministic and SQL-replayable.

Output per k = 0..k_max: (k, removed_node [-1 at k=0], giant_size,
n_components) over the surviving subgraph.

100-TB shape: the graph is the bounded combiner output; the BFS
closes per step on it. The oracle recounts components per k via
reachability closures — no BFS."""

from __future__ import annotations

from collections import deque

import pandas as pd


def attack_curve(edges: pd.DataFrame, k_max: int = 5) -> pd.DataFrame:
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    adj: dict[int, set[int]] = {}
    for a, b in sorted(pairs):
        adj.setdefault(a, set()).add(b)
    nodes = sorted(adj)
    order = sorted(nodes, key=lambda v: (-len(adj[v]), v))
    rows = []
    for k in range(min(k_max, len(nodes)) + 1):
        removed = set(order[:k])
        seen: set[int] = set()
        giant, comps = 0, 0
        for s in nodes:
            if s in removed or s in seen:
                continue
            comps += 1
            size = 0
            q = deque([s])
            seen.add(s)
            while q:
                u = q.popleft()
                size += 1
                for v in adj[u]:
                    if v not in removed and v not in seen:
                        seen.add(v)
                        q.append(v)
            giant = max(giant, size)
        rows.append(
            (k, order[k - 1] if k else -1, giant, comps)
        )
    return pd.DataFrame(
        rows, columns=["k", "removed_node", "giant_size", "n_components"]
    ).astype("int64")
