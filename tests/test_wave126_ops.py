"""Wave-126 ops: k-truss — clique closed form, peel cascades,
reference parity, layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(edges):
    import ray.data as rd

    s, d = zip(*edges)
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(s, type=pa.int64()),
                "dst": pa.array(d, type=pa.int64()),
            }
        )
    )


def _ref(edges, k, rounds):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for _ in range(rounds):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        es = {
            (a, b)
            for a, b in es
            if len(adj[a] & adj[b]) >= k - 2
        }
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sorted((a, b, len(adj[a] & adj[b])) for a, b in es)


def test_ktruss_clique_survives_pendant_falls():
    from ocr_service_ray.ops.truss import k_truss

    # K5 plus a pendant edge: 4-truss keeps K5, drops the pendant
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges = k5 + [(4, 99)]
    out = k_truss(_ds(edges), k=4, rounds=4)
    assert len(out) == 10
    assert 99 not in set(out["lo"]) | set(out["hi"])
    assert (out["support"] == 3).all()  # every K5 edge in 3 triangles


def test_ktruss_peel_cascade():
    from ocr_service_ray.ops.truss import k_truss

    # triangle chain: removing weak edges cascades to empty at k=4
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    out = k_truss(_ds(edges), k=4, rounds=4)
    assert len(out) == 0


def test_ktruss_random_vs_reference():
    from ocr_service_ray.ops.truss import k_truss

    rng = np.random.RandomState(126)
    for _ in range(4):
        edges = list(
            {
                (int(rng.randint(12)), int(rng.randint(12)))
                for _ in range(50)
            }
        )
        out = k_truss(_ds(edges), k=4, rounds=5)
        got = list(zip(out["lo"], out["hi"], out["support"]))
        assert got == _ref(edges, 4, 5)


def test_ktruss_layout_invariance():
    from ocr_service_ray.ops.truss import k_truss

    rng = np.random.RandomState(8)
    edges = list(
        {(int(rng.randint(10)), int(rng.randint(10))) for _ in range(40)}
    )
    base = k_truss(_ds(edges), k=4, rounds=4)
    out = k_truss(_ds(edges[::-1]).repartition(6), k=4, rounds=4)
    pd.testing.assert_frame_equal(base, out)
