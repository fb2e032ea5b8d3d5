"""Global minimum cut — Stoer-Wagner maximum-adjacency contraction
(Stoer & Wagner, JACM 1997; the deterministic O(nm + n² log n)
global min-cut, no flow computations and no Karger randomness —
the bottleneck/partition-fragility audit for weighted graphs).

Each phase grows a maximum-adjacency order (ties to the smallest
vertex id — the determinism contract), records the cut-of-the-phase
(the last vertex's connectivity to the rest), and contracts the last
two vertices; the global min cut is the best phase cut. The oracle
cross-checks with EXHAUSTIVE partition enumeration (2^(n-1) bitmask
subsets), so the algorithm is verified against ground truth, not
against a replay of itself.

100-TB shape: the weighted adjacency matrix is the grouped-count
combiner output (|nodes|²-bounded — here the 5 regions); the
contraction close is driver-side on that bounded matrix (the
gale-shapley/huffman discipline). The data-parallel phase is the
join+combiner that builds the matrix."""

from __future__ import annotations

import numpy as np
import pandas as pd


def stoer_wagner(pairs: pd.DataFrame, a_col: str, b_col: str, w_col: str) -> dict:
    """Exact global min cut of the weighted undirected graph given as
    a (possibly directed / duplicated) pair table — weights are
    summed per unordered pair. Returns ``{"cut_weight": int,
    "cut_side": sorted tuple of original node ids (the smaller
    side, ties by lexicographic order), "n_nodes": int,
    "total_weight": int}``."""
    agg: dict[tuple, int] = {}
    for a, b, w in zip(pairs[a_col], pairs[b_col], pairs[w_col]):
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        agg[k] = agg.get(k, 0) + int(w)
    nodes = sorted({x for k in agg for x in k})
    if len(nodes) < 2:
        raise ValueError("min cut needs >= 2 connected nodes")
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n), dtype=np.int64)
    for (a, b), v in agg.items():
        w[idx[a], idx[b]] = v
        w[idx[b], idx[a]] = v
    total = int(w.sum() // 2)

    # merged[i] = set of original nodes represented by supernode i
    groups = {i: {nodes[i]} for i in range(n)}
    active = sorted(groups)
    best = None
    while len(active) > 1:
        # maximum adjacency order; start from smallest active id
        order = [active[0]]
        rest = [v for v in active[1:]]
        conn = {v: int(w[order[0], v]) for v in rest}
        while rest:
            # pick max connectivity, tie -> smallest supernode id
            nxt = max(rest, key=lambda v: (conn[v], -v))
            order.append(nxt)
            rest.remove(nxt)
            for v in rest:
                conn[v] += int(w[nxt, v])
        t = order[-1]
        s = order[-2]
        cut_of_phase = int(sum(w[t, v] for v in active if v != t))
        side = tuple(sorted(groups[t]))
        cand = (cut_of_phase, len(side), side)
        if best is None or cand < best:
            best = cand
        # contract t into s
        for v in active:
            if v not in (s, t):
                w[s, v] += w[t, v]
                w[v, s] = w[s, v]
        groups[s] |= groups[t]
        del groups[t]
        active.remove(t)
        w[t, :] = 0
        w[:, t] = 0

    cut_weight, _, side = best
    other = tuple(sorted(set(nodes) - set(side)))
    pick = min((side, other), key=lambda t_: (len(t_), t_))
    return {
        "cut_weight": int(cut_weight),
        "cut_side": pick,
        "n_nodes": n,
        "total_weight": total,
    }
