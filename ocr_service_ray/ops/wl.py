"""Weisfeiler-Lehman color refinement (1-WL / naive vertex
refinement — Weisfeiler & Lehman 1968; the canonical graph-
fingerprinting primitive behind WL graph kernels and GNN
expressiveness bounds): iteratively recolor every node with a hash
of (own color, sorted multiset of neighbour colors) until the
partition stabilizes.

Determinism contract (the SQL oracle replays it verbatim):
  c0(v)   = str(degree(v))
  cr(v)   = md5( cr-1(v) || '|' || ','.join(sorted(cr-1(u) for u in N(v))) )
Neighbour colors are sorted as STRINGS (DuckDB ``string_agg(c, ','
ORDER BY c)``), so equal colors collapse to identical strings no
matter the edge order — layout-invariant by construction.

100-TB shape: the graph here is the |nations|²-bounded output of the
lineitem→orders→customer→supplier count combiner (the only big-data
phase — same discipline as ops/mis.py / ops/matching.py); refinement
closes on the bounded edge list. For billion-node graphs the same
recolor step is one edge scan + a per-node sorted string-agg
combiner per round — the structure is already round-per-scan."""

from __future__ import annotations

import hashlib

import pandas as pd


def wl_refine(edges: pd.DataFrame, rounds: int = 3) -> pd.DataFrame:
    """1-WL refinement over an undirected graph given as an edge
    DataFrame (``src``, ``dst``; symmetrized and deduped internally,
    self-loops dropped). Returns one row per node:
    ``(node, degree, color1, .., colorN, class_size)`` where colors
    are md5 hex strings and class_size is the size of the node's
    final color class."""
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    adj: dict[int, list[int]] = {}
    for a, b in sorted(pairs):
        adj.setdefault(a, []).append(b)
    nodes = sorted(adj)
    color = {v: str(len(adj[v])) for v in nodes}
    hist = []
    for _ in range(rounds):
        color = {
            v: hashlib.md5(
                (color[v] + "|" + ",".join(sorted(color[u] for u in adj[v]))).encode()
            ).hexdigest()
            for v in nodes
        }
        hist.append(dict(color))
    sizes: dict[str, int] = {}
    for v in nodes:
        sizes[color[v]] = sizes.get(color[v], 0) + 1
    out = {
        "node": pd.Series(nodes, dtype="int64"),
        "degree": pd.Series([len(adj[v]) for v in nodes], dtype="int64"),
    }
    for r, h in enumerate(hist, 1):
        out[f"color{r}"] = [h[v] for v in nodes]
    out["class_size"] = pd.Series([sizes[color[v]] for v in nodes], dtype="int64")
    return pd.DataFrame(out)
