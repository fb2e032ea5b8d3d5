"""Maximal-clique census — Bron-Kerbosch with pivoting (Bron &
Kerbosch 1973): enumerate every maximal clique of the bounded graph;
report the clique number, how many maximum cliques attain it and the
total maximal count. The densest-cohort audit (mutual-trade blocs
here; co-occurrence cliques in general). The oracle re-derives every
number by EXHAUSTIVE subset enumeration over the bounded node set —
independent algorithm, one answer.

100-TB shape: the graph is the bounded combiner output (|nations|
fixed); the exponential close is driver work by contract."""

from __future__ import annotations

import pandas as pd


def bron_kerbosch(adj: dict[int, set[int]]) -> list[frozenset[int]]:
    """All maximal cliques (pivoting; deterministic order)."""
    cliques: list[frozenset[int]] = []

    def bk(R: set, P: set, X: set):
        if not P and not X:
            cliques.append(frozenset(R))
            return
        pivot = max(
            sorted(P | X), key=lambda u: len(P & adj[u])
        )
        for v in sorted(P - adj[pivot]):
            bk(R | {v}, P & adj[v], X & adj[v])
            P = P - {v}
            X = X | {v}

    bk(set(), set(adj), set())
    return cliques


def clique_report(edges: pd.DataFrame) -> pd.DataFrame:
    """(n_nodes, n_edges, clique_number, n_maximum, n_maximal) over
    an undirected edge list (``src``, ``dst``; symmetrized,
    deduped, self-loops dropped)."""
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if not adj:
        return pd.DataFrame(
            {
                "n_nodes": [0],
                "n_edges": [0],
                "clique_number": [0],
                "n_maximum": [0],
                "n_maximal": [0],
            }
        ).astype("int64")
    cliques = bron_kerbosch(adj)
    w = max(len(c) for c in cliques)
    return pd.DataFrame(
        {
            "n_nodes": [len(adj)],
            "n_edges": [len(pairs)],
            "clique_number": [w],
            "n_maximum": [sum(1 for c in cliques if len(c) == w)],
            "n_maximal": [len(cliques)],
        }
    ).astype("int64")
