"""Katz centrality — Katz 1953: node influence as the attenuated sum
of walks of every length ending at the node. Computed EXACTLY in
integers: with attenuation 1/4 and a 4-hop horizon, score(v) =
sum_{k=1..4} walks_k(v) * 4^(4-k)  (common denominator 4^4) — walk
counts are pure integer matrix-vector rounds, so engine and oracle
agree bit-for-bit (the fixed-round discipline of ops/pagerank.py,
without its normalization division).

  walks_1(v) = in-degree… generally w_{k}(v) = sum_{u->v} w_{k-1}(u),
  w_0 = 1 everywhere.

100-TB shape: per round ONE edge scan + per-node sum combiner
against the broadcast previous vector; the graph here is the
bounded trade combiner output."""

from __future__ import annotations

import pandas as pd


def katz_scores(edges: pd.DataFrame, rounds: int = 4) -> pd.DataFrame:
    """(node, in_degree, katz_num) over a directed edge list
    (``src``, ``dst``; deduped, self-loops dropped); katz_num is the
    4^rounds-scaled integer Katz sum."""
    arcs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(edges["src"], edges["dst"])
            if int(a) != int(b)
        }
    )
    nodes = sorted({x for e in arcs for x in e})
    w = {v: 1 for v in nodes}
    katz = {v: 0 for v in nodes}
    for k in range(1, rounds + 1):
        nw = {v: 0 for v in nodes}
        for a, b in arcs:
            nw[b] += w[a]
        for v in nodes:
            katz[v] += nw[v] * 4 ** (rounds - k)
        w = nw
    indeg = {v: 0 for v in nodes}
    for _, b in arcs:
        indeg[b] += 1
    return pd.DataFrame(
        {
            "node": nodes,
            "in_degree": [indeg[v] for v in nodes],
            "katz_num": [katz[v] for v in nodes],
        }
    ).astype("int64")
