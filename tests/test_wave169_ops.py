"""Wave-169 ops: Held-Karp TSP — brute enumeration parity, square
closed form, degenerate sizes."""

import itertools

import numpy as np
import pandas as pd

from ocr_service_ray.ops.tsp import held_karp, tsp_report


def _brute(dist, nodes, want_max=False):
    s = nodes[0]
    vals = []
    for perm in itertools.permutations(nodes[1:]):
        tour = [s] + list(perm) + [s]
        vals.append(sum(dist[(a, b)] for a, b in zip(tour, tour[1:])))
    return max(vals) if want_max else min(vals)


def test_square_closed_form():
    # 4 nodes on a square: sides 1, diagonals 10
    nodes = [0, 1, 2, 3]
    d = {}
    sides = {(0, 1), (1, 2), (2, 3), (0, 3)}
    for i in nodes:
        for j in nodes:
            if i != j:
                key = (min(i, j), max(i, j))
                d[(i, j)] = 1 if tuple(sorted((i, j))) in sides else 10
    assert held_karp(d, nodes) == 4  # the perimeter
    assert held_karp(d, nodes, want_max=True) == 22  # two diagonals + 2 sides


def test_random_vs_brute():
    rng = np.random.RandomState(169)
    for _ in range(15):
        n = int(rng.randint(3, 8))
        nodes = list(range(n))
        d = {}
        for i in nodes:
            for j in nodes:
                if i < j:
                    w = int(rng.randint(1, 100))
                    d[(i, j)] = w
                    d[(j, i)] = w
        assert held_karp(d, nodes) == _brute(d, nodes)
        assert held_karp(d, nodes, True) == _brute(d, nodes, True)


def test_report_counts():
    cnt = pd.DataFrame(
        {
            "a": [0, 0, 3, 3, 6],
            "b": [3, 6, 6, 0, 0],
            "n": [100, 10, 5, 50, 1],
        }
    )
    out = tsp_report(cnt, "a", "b", "n")
    assert out.loc[0, "n_cities"] == 3
    assert out.loc[0, "n_tours"] == 1  # (3-1)!/2
    # with 3 cities there is a single undirected tour: best == worst
    assert out.loc[0, "best_cost"] == out.loc[0, "worst_cost"]


def test_two_cities():
    cnt = pd.DataFrame({"a": [0], "b": [3], "n": [9]})
    out = tsp_report(cnt, "a", "b", "n")
    assert out.loc[0, "n_cities"] == 2
    assert out.loc[0, "best_cost"] == 2 * (1_000_000 // 10)
