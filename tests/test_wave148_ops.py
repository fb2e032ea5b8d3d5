"""Wave-148 ops: Edmonds-Karp max flow / min cut — closed forms,
random parity vs exhaustive cut enumeration, minimal-cut-side
uniqueness."""

import itertools

import numpy as np
import pandas as pd

from ocr_service_ray.ops.maxflow import edmonds_karp, min_cut_table


def _brute_min_cut(cap, nodes, s, t):
    """Exhaustive (capacity, |S|)-argmin over source-side subsets."""
    others = [v for v in nodes if v not in (s, t)]
    best = None
    for r in range(len(others) + 1):
        for extra in itertools.combinations(others, r):
            S = {s} | set(extra)
            c = sum(
                cap[(u, v)] for (u, v) in cap if u in S and v not in S
            )
            key = (c, len(S), tuple(sorted(S)))
            if best is None or key < best:
                best = key
    return best[0], set(best[2])


def test_single_path_bottleneck():
    cap = {(0, 1): 5, (1, 2): 3, (2, 3): 7}
    flow, side = edmonds_karp(cap, [0, 1, 2, 3], 0, 3)
    assert flow == 3
    assert side == {0, 1}  # residual reachability stops at the 3-cap arc


def test_parallel_paths_sum():
    cap = {(0, 1): 4, (1, 3): 4, (0, 2): 2, (2, 3): 2}
    flow, _ = edmonds_karp(cap, [0, 1, 2, 3], 0, 3)
    assert flow == 6


def test_clrs_example():
    # CLRS figure 26.6 classic network, max flow 23
    cap = {
        (0, 1): 16, (0, 2): 13, (1, 2): 10, (2, 1): 4,
        (1, 3): 12, (3, 2): 9, (2, 4): 14, (4, 3): 7,
        (3, 5): 20, (4, 5): 4,
    }
    flow, _ = edmonds_karp(cap, list(range(6)), 0, 5)
    assert flow == 23


def test_disconnected_zero_flow():
    cap = {(0, 1): 5, (2, 3): 5}
    flow, side = edmonds_karp(cap, [0, 1, 2, 3], 0, 3)
    assert flow == 0
    assert side == {0, 1}


def test_random_vs_brute():
    rng = np.random.RandomState(148)
    for _ in range(15):
        k = int(rng.randint(4, 8))
        nodes = list(range(k))
        cap = {}
        for u in nodes:
            for v in nodes:
                if u != v and rng.rand() < 0.4:
                    cap[(u, v)] = int(rng.randint(1, 20))
        if not cap:
            continue
        s, t = 0, k - 1
        flow, side = edmonds_karp(cap, nodes, s, t)
        bc, bs = _brute_min_cut(cap, nodes, s, t)
        assert flow == bc  # duality
        assert side == bs  # lattice-minimal cut = enumeration argmin


def test_table_shape():
    edges = pd.DataFrame(
        {"src": [0, 1, 0], "dst": [1, 9, 9], "cap": [3, 3, 1]}
    )
    out = min_cut_table(edges)
    assert list(out["node"]) == [0, 1, 9]
    assert out["max_flow"].iloc[0] == 4
    assert list(out["source_side"]) == [1, 0, 0]
