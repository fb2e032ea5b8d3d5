"""Wave-133 ops: Stoer-Wagner min cut — brute-force parity, side
validity, known topologies."""

import itertools

import numpy as np
import pandas as pd


def _pairs(edges):
    a, b, w = zip(*edges)
    return pd.DataFrame({"a": a, "b": b, "w": w})


def _brute_cut(edges):
    agg = {}
    for a, b, w in edges:
        if a != b:
            k = (min(a, b), max(a, b))
            agg[k] = agg.get(k, 0) + w
    nodes = sorted({x for k in agg for x in k})
    best = None
    for r in range(1, len(nodes)):
        for side in itertools.combinations(nodes[1:], r):
            s = set(side)
            cut = sum(
                w
                for (a, b), w in agg.items()
                if (a in s) != (b in s)
            )
            if best is None or cut < best:
                best = cut
    return best


def _cut_of(edges, side):
    s = set(side)
    agg = {}
    for a, b, w in edges:
        if a != b:
            k = (min(a, b), max(a, b))
            agg[k] = agg.get(k, 0) + w
    return sum(w for (a, b), w in agg.items() if (a in s) != (b in s))


def test_mincut_dumbbell():
    from ocr_service_ray.ops.mincut import stoer_wagner

    # two triangles joined by one weight-1 bridge
    edges = [
        (0, 1, 5), (1, 2, 5), (0, 2, 5),
        (3, 4, 5), (4, 5, 5), (3, 5, 5),
        (2, 3, 1),
    ]
    out = stoer_wagner(_pairs(edges), "a", "b", "w")
    assert out["cut_weight"] == 1
    assert set(out["cut_side"]) in ({0, 1, 2}, {3, 4, 5})
    assert out["total_weight"] == 31


def test_mincut_pendant():
    from ocr_service_ray.ops.mincut import stoer_wagner

    edges = [(0, 1, 10), (1, 2, 10), (0, 2, 10), (2, 9, 3)]
    out = stoer_wagner(_pairs(edges), "a", "b", "w")
    assert out["cut_weight"] == 3
    assert out["cut_side"] == (9,)


def test_mincut_random_vs_brute():
    from ocr_service_ray.ops.mincut import stoer_wagner

    rng = np.random.RandomState(133)
    for _ in range(8):
        n = int(rng.randint(4, 9))
        edges = []
        for a in range(n):
            for b in range(a + 1, n):
                if rng.rand() < 0.7:
                    edges.append((a, b, int(rng.randint(1, 50))))
        nodes = {x for e in edges for x in e[:2]}
        if len(nodes) < 2:
            continue
        out = stoer_wagner(_pairs(edges), "a", "b", "w")
        assert out["cut_weight"] == _brute_cut(edges)
        # returned side realizes the claimed cut
        assert _cut_of(edges, out["cut_side"]) == out["cut_weight"]


def test_mincut_directed_pairs_summed():
    from ocr_service_ray.ops.mincut import stoer_wagner

    # both directions present: weights sum per unordered pair
    edges = [(0, 1, 3), (1, 0, 4), (1, 2, 1)]
    out = stoer_wagner(_pairs(edges), "a", "b", "w")
    assert out["cut_weight"] == 1
    assert out["total_weight"] == 8
