"""Wave-137 ops: harmonic centrality — BFS reference parity,
directedness, hop bound, star closed form."""

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


def _ref(edges, rounds):
    nodes = sorted({x for e in edges for x in e})
    adj = {v: set() for v in nodes}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
    out = {}
    for s in nodes:
        dist = {s: 0}
        frontier = {s}
        for r in range(1, rounds + 1):
            nxt = set()
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = r
                        nxt.add(v)
            frontier = nxt
        ds_ = [d for t, d in dist.items() if t != s]
        out[s] = (
            sum(1_000_000 // d for d in ds_),
            len(ds_),
            max(ds_) if ds_ else 0,
        )
    return out


def test_harmonic_star_closed_form():
    from ocr_service_ray.ops.centrality import harmonic_centrality

    # hub -> 4 leaves: hub reaches 4 at d=1 (harmonic 4e6);
    # leaves reach nothing (directed)
    out = harmonic_centrality(_ds([(0, i) for i in range(1, 5)]), rounds=3)
    got = dict(zip(out["node"], out["harmonic_micro"]))
    assert got[0] == 4_000_000
    assert all(got[i] == 0 for i in range(1, 5))


def test_harmonic_chain_hop_bound():
    from ocr_service_ray.ops.centrality import harmonic_centrality

    # 0->1->2->3->4->5 with rounds=3: node 0 reaches 1,2,3 only
    out = harmonic_centrality(
        _ds([(i, i + 1) for i in range(5)]), rounds=3
    )
    row = out[out["node"] == 0].iloc[0]
    assert row["n_reached"] == 3
    assert row["ecc"] == 3
    assert row["harmonic_micro"] == 1_000_000 + 500_000 + 333_333


def test_harmonic_random_vs_reference():
    from ocr_service_ray.ops.centrality import harmonic_centrality

    rng = np.random.RandomState(137)
    edges = [
        (int(rng.randint(12)), int(rng.randint(12))) for _ in range(35)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    out = harmonic_centrality(_ds(edges), rounds=4)
    ref = _ref(edges, 4)
    for _, r in out.iterrows():
        assert (
            r["harmonic_micro"],
            r["n_reached"],
            r["ecc"],
        ) == ref[r["node"]]


def test_harmonic_layout_invariance():
    from ocr_service_ray.ops.centrality import harmonic_centrality

    rng = np.random.RandomState(4)
    edges = [
        (u, v)
        for u, v in (
            (int(rng.randint(9)), int(rng.randint(9))) for _ in range(25)
        )
        if u != v
    ]
    base = harmonic_centrality(_ds(edges), rounds=3)
    out = harmonic_centrality(_ds(edges[::-1]).repartition(5), rounds=3)
    pd.testing.assert_frame_equal(base, out)
