"""Exact travelling-salesman tour bounds — Held-Karp bitmask dynamic
programming (Held & Karp 1962, O(2^n n^2)) for BOTH the cheapest and
the costliest Hamiltonian cycle, verified against the oracle's brute
(n-1)!-tour enumeration — independent algorithms, one answer. The
routing-audit shape: an exact "how good could a visit order be"
bound over a bounded entity set (regions, racks, shards), with
distances derived from data.

Contract: complete symmetric metric d(a,b) =
10^6 // (1 + vol(a,b) + vol(b,a)) over the combiner trade counts
(more trade = closer); tours are cycles through all nodes anchored
at the smallest node; n_tours = (n-1)!/2 for n >= 3.

100-TB shape: the distance matrix is the bounded combiner output;
the 2^n DP closes on it (ops/shapley.py lattice discipline)."""

from __future__ import annotations

import math

import pandas as pd


def held_karp(dist: dict[tuple[int, int], int], nodes: list[int], want_max: bool = False) -> int:
    """Optimal Hamiltonian-cycle cost (min or max) anchored at
    nodes[0]."""
    n = len(nodes)
    if n == 1:
        return 0
    if n == 2:
        return 2 * dist[(nodes[0], nodes[1])]
    idx = {v: i for i, v in enumerate(nodes)}
    start = nodes[0]
    rest = nodes[1:]
    m = len(rest)
    better = max if want_max else min
    INF = None
    # dp[(mask, j)] = best cost start -> ... -> rest[j] visiting mask
    dp: dict[tuple[int, int], int] = {}
    for j, v in enumerate(rest):
        dp[(1 << j, j)] = dist[(start, v)]
    for mask in range(1, 1 << m):
        for j in range(m):
            if not (mask >> j & 1) or (mask, j) not in dp:
                continue
            base = dp[(mask, j)]
            for k in range(m):
                if mask >> k & 1:
                    continue
                nm = mask | (1 << k)
                cand = base + dist[(rest[j], rest[k])]
                cur = dp.get((nm, k))
                if cur is None or better(cur, cand) == cand:
                    dp[(nm, k)] = cand
    full = (1 << m) - 1
    tours = [
        dp[(full, j)] + dist[(rest[j], start)] for j in range(m)
    ]
    return better(tours)


def tsp_report(counts: pd.DataFrame, a_col: str, b_col: str, n_col: str) -> pd.DataFrame:
    """One-row (n_cities, best_cost, worst_cost, n_tours) over the
    symmetric trade-distance metric."""
    vol: dict[tuple[int, int], int] = {}
    for a, b, n in zip(
        counts[a_col].astype(int), counts[b_col].astype(int), counts[n_col].astype(int)
    ):
        if a != b:
            key = (min(a, b), max(a, b))
            vol[key] = vol.get(key, 0) + n
    nodes = sorted({x for k in vol for x in k})
    dist = {}
    for i in nodes:
        for j in nodes:
            if i != j:
                key = (min(i, j), max(i, j))
                dist[(i, j)] = 1_000_000 // (1 + vol.get(key, 0))
    n = len(nodes)
    best = held_karp(dist, nodes, want_max=False)
    worst = held_karp(dist, nodes, want_max=True)
    n_tours = math.factorial(n - 1) // 2 if n >= 3 else 1
    return pd.DataFrame(
        {
            "n_cities": [n],
            "best_cost": [best],
            "worst_cost": [worst],
            "n_tours": [n_tours],
        }
    ).astype("int64")
