"""Wave-127 ops: RA link prediction — brute parity, hub discount,
absent-only guarantee, layout invariance."""

import itertools

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


def _brute(edges, top_k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for a, b in itertools.combinations(sorted(adj), 2):
        if (a, b) in es:
            continue
        common = adj[a] & adj[b]
        if not common:
            continue
        rows.append(
            (
                a,
                b,
                len(common),
                sum(1_000_000 // len(adj[w]) for w in common),
            )
        )
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


def test_ra_brute_parity_random():
    from ocr_service_ray.ops.linkpred import ra_link_prediction

    rng = np.random.RandomState(127)
    for _ in range(4):
        edges = list(
            {(int(rng.randint(12)), int(rng.randint(12))) for _ in range(40)}
        )
        out = ra_link_prediction(_ds(edges), top_k=8)
        got = list(zip(out["lo"], out["hi"], out["n_common"], out["ra_micro"]))
        assert got == _brute(edges, 8)


def test_ra_discounts_hub_neighbours():
    from ocr_service_ray.ops.linkpred import ra_link_prediction

    # 0-1 share low-degree neighbour 2 (deg 2); 3-4 share hub 5
    # (deg 6): the low-degree wedge must outrank the hub wedge
    edges = [(0, 2), (1, 2), (3, 5), (4, 5), (6, 5), (7, 5)]
    out = ra_link_prediction(_ds(edges), top_k=20)
    sc = {(r.lo, r.hi): r.ra_micro for r in out.itertuples()}
    assert sc[(0, 1)] == 500_000
    assert sc[(3, 4)] == 250_000
    assert sc[(0, 1)] > sc[(3, 4)]


def test_ra_predicts_only_absent_edges():
    from ocr_service_ray.ops.linkpred import ra_link_prediction

    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]  # K5
    out = ra_link_prediction(_ds(edges), top_k=10)
    assert len(out) == 0  # complete graph: nothing to predict


def test_ra_layout_invariance():
    from ocr_service_ray.ops.linkpred import ra_link_prediction

    rng = np.random.RandomState(4)
    edges = list(
        {(int(rng.randint(10)), int(rng.randint(10))) for _ in range(30)}
    )
    base = ra_link_prediction(_ds(edges), top_k=6)
    out = ra_link_prediction(_ds(edges[::-1]).repartition(5), top_k=6)
    pd.testing.assert_frame_equal(base, out)
