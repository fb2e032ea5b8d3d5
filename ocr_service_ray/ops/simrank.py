"""SimRank structural similarity — Jeh & Widom 2002: "two nodes are
similar when their neighbours are similar", the recursive
link-structure sibling of co-citation. Computed here in EXACT micro
integers with floor division, so the fixed-round iteration (the
pagerank/labelprop unrolled discipline) is bit-identical in engine
and oracle — no float drift.

Contract (undirected graph, C = 0.8):
  s_0(a,b) = 10^6 if a = b else 0
  s_{k+1}(a,a) = 10^6
  s_{k+1}(a,b) = (8 * sum_{i in N(a), j in N(b)} s_k(i,j))
                 // (10 * |N(a)| * |N(b)|)        for a != b
  3 rounds; reported pairs: a < b with s_3 > 0.

100-TB shape: the graph is the bounded trade combiner output; the
O(rounds * m^2) recursion closes on it (ops/mis.py discipline)."""

from __future__ import annotations

import pandas as pd


def simrank(edges: pd.DataFrame, rounds: int = 3) -> pd.DataFrame:
    """Micro-integer SimRank over an undirected edge list (``src``,
    ``dst``; symmetrized, deduped, self-loops dropped). Returns
    ``(node_a, node_b, deg_a, deg_b, sim_micro)`` for a < b with
    sim_micro > 0, sorted."""
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    adj: dict[int, list[int]] = {}
    for a, b in sorted(pairs):
        adj.setdefault(a, []).append(b)
    nodes = sorted(adj)
    s = {(a, b): (1_000_000 if a == b else 0) for a in nodes for b in nodes}
    for _ in range(rounds):
        ns = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    ns[(a, b)] = 1_000_000
                else:
                    tot = 0
                    for i in adj[a]:
                        for j in adj[b]:
                            tot += s[(i, j)]
                    ns[(a, b)] = (8 * tot) // (10 * len(adj[a]) * len(adj[b]))
        s = ns
    rows = [
        (a, b, len(adj[a]), len(adj[b]), s[(a, b)])
        for a in nodes
        for b in nodes
        if a < b and s[(a, b)] > 0
    ]
    return pd.DataFrame(
        rows, columns=["node_a", "node_b", "deg_a", "deg_b", "sim_micro"]
    ).astype("int64")
