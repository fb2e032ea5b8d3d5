"""Wave-113 ops: Borůvka minimum spanning forest — vs Kruskal."""

import numpy as np
import pyarrow as pa


def _ds(edges):
    import ray.data as rd

    lo, hi, w = zip(*edges)
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(lo, type=pa.int64()),
                "dst": pa.array(hi, type=pa.int64()),
                "w": pa.array(w, type=pa.int64()),
            }
        )
    )


def _kruskal(edges):
    """In-test reference: classic Kruskal with union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for u, v, _ in edges:
        nodes.add(u)
        nodes.add(v)
        find(u)
        find(v)
    total = n = ck = 0
    for u, v, w in sorted(edges, key=lambda e: e[2]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            total += w
            n += 1
            lo, hi = sorted((u, v))
            ck += lo * 100003 + hi
    comps = len({find(x) for x in nodes})
    return {
        "n_nodes": len(nodes),
        "n_edges": len(edges),
        "n_components": comps,
        "msf_edges": n,
        "msf_weight": total,
        "edge_checksum": ck,
    }


def _rand_edges(rng, n_nodes, n_edges):
    seen = set()
    edges = []
    weights = rng.permutation(10 * n_edges)[:n_edges]
    k = 0
    while len(edges) < n_edges:
        u, v = int(rng.randint(n_nodes)), int(rng.randint(n_nodes))
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((u, v, int(weights[k]) + 1))
        k += 1
    return edges


def test_boruvka_hand_checked():
    from ocr_service_ray.ops.mst import boruvka_msf

    # triangle 0-1-2 plus pendant 3: MST drops the heaviest triangle edge
    edges = [(0, 1, 1), (1, 2, 2), (0, 2, 3), (2, 3, 4)]
    out = boruvka_msf(_ds(edges))
    assert out == _kruskal(edges)
    assert out["msf_weight"] == 7 and out["msf_edges"] == 3
    assert out["n_components"] == 1


def test_boruvka_disconnected_forest():
    from ocr_service_ray.ops.mst import boruvka_msf

    # two components and an isolated-pair component
    edges = [(0, 1, 5), (1, 2, 3), (10, 11, 7), (11, 12, 2), (10, 12, 9)]
    out = boruvka_msf(_ds(edges))
    assert out == _kruskal(edges)
    assert out["n_components"] == 2


def test_boruvka_random_vs_kruskal():
    from ocr_service_ray.ops.mst import boruvka_msf

    rng = np.random.RandomState(113)
    for n_nodes, n_edges in [(12, 30), (40, 120), (60, 80)]:
        edges = _rand_edges(rng, n_nodes, n_edges)
        assert boruvka_msf(_ds(edges)) == _kruskal(edges)


def test_boruvka_layout_invariance():
    from ocr_service_ray.ops.mst import boruvka_msf

    rng = np.random.RandomState(7)
    edges = _rand_edges(rng, 30, 90)
    base = boruvka_msf(_ds(edges))
    out = boruvka_msf(_ds(edges[::-1]).repartition(7))
    assert out == base


def test_boruvka_rejects_duplicate_weights():
    import pytest

    from ocr_service_ray.ops.mst import boruvka_msf

    with pytest.raises(Exception, match="unique edge weights"):
        boruvka_msf(_ds([(0, 1, 5), (1, 2, 5)]))
