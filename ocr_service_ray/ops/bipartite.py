"""Maximum bipartite matching + König cover — Kuhn's augmenting-path
algorithm (Kuhn 1955, the unweighted sibling of ops/assignment.py's
Kuhn-Munkres) with the König certificate: in bipartite graphs
max matching = min vertex cover, so the oracle can verify the
matching SIZE by enumerating covers over the bounded left side —
an LP-duality ground truth, not an algorithm replay.

Determinism: left nodes processed ascending, neighbours ascending —
the matched-pair set is deterministic (validity and size pinned in
tests; only size + cover size are oracle-compared since maximum
matchings are not unique).

100-TB shape: the biadjacency is a bounded count-combiner output
(|left| fixed by the region contract); the augmenting close runs on
it."""

from __future__ import annotations

import pandas as pd


def kuhn_matching(edges: pd.DataFrame, left_col: str, right_col: str):
    """Maximum matching via augmenting DFS. Returns (match dict
    left->right, left nodes, right nodes)."""
    adj: dict[int, list[int]] = {}
    rights = set()
    for a, b in sorted(
        {(int(x), int(y)) for x, y in zip(edges[left_col], edges[right_col])}
    ):
        adj.setdefault(a, []).append(b)
        rights.add(b)
    match_r: dict[int, int] = {}

    def try_augment(u: int, seen: set) -> bool:
        for v in adj.get(u, ()):
            if v in seen:
                continue
            seen.add(v)
            if v not in match_r or try_augment(match_r[v], seen):
                match_r[v] = u
                return True
        return False

    for u in sorted(adj):
        try_augment(u, set())
    return (
        {u: v for v, u in match_r.items()},
        sorted(adj),
        sorted(rights),
    )


def min_vertex_cover_size(edges: pd.DataFrame, left_col: str, right_col: str) -> int:
    """Exhaustive min cover: for each subset S of the left side,
    cover = S plus every right node adjacent to a left node outside
    S. Exponential in |left| — bounded-side contract."""
    pairs = sorted(
        {(int(x), int(y)) for x, y in zip(edges[left_col], edges[right_col])}
    )
    lefts = sorted({a for a, _ in pairs})
    best = None
    for mask in range(1 << len(lefts)):
        inS = {lefts[i] for i in range(len(lefts)) if mask >> i & 1}
        need = {b for a, b in pairs if a not in inS}
        size = len(inS) + len(need)
        if best is None or size < best:
            best = size
    return best or 0


def matching_report(edges: pd.DataFrame, left_col: str, right_col: str) -> pd.DataFrame:
    """One-row ``(n_left, n_right, n_edges, matching_size,
    min_cover_size)`` — König equality asserted."""
    match, lefts, rights = kuhn_matching(edges, left_col, right_col)
    n_edges = len(
        {(int(x), int(y)) for x, y in zip(edges[left_col], edges[right_col])}
    )
    cover = min_vertex_cover_size(edges, left_col, right_col)
    assert cover == len(match), "König duality violated — matching bug"
    return pd.DataFrame(
        {
            "n_left": [len(lefts)],
            "n_right": [len(rights)],
            "n_edges": [n_edges],
            "matching_size": [len(match)],
            "min_cover_size": [cover],
        }
    ).astype("int64")
