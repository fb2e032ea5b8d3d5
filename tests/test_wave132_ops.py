"""Wave-132 ops: label propagation — two-clique separation,
reference parity, isolated nodes, layout invariance."""

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
    adj = {v: [] for v in nodes}
    for u, v in edges:
        if u != v:
            adj[u].append(v)
            adj[v].append(u)
    lbl = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            if not adj[v]:
                new[v] = lbl[v]
                continue
            counts = {}
            for u in adj[v]:
                counts[lbl[u]] = counts.get(lbl[u], 0) + 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        lbl = new
    return lbl


def test_lpa_separates_two_cliques():
    from ocr_service_ray.ops.labelprop import label_propagation

    k1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    k2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    bridge = [(4, 10)]
    out = label_propagation(_ds(k1 + k2 + bridge), rounds=4)
    lbl = dict(zip(out["node"], out["label"]))
    # each clique converges to one label; the two differ
    assert len({lbl[i] for i in range(5)}) == 1
    assert len({lbl[i] for i in range(10, 15)}) == 1
    assert lbl[0] != lbl[10]


def test_lpa_matches_reference_random():
    from ocr_service_ray.ops.labelprop import label_propagation

    rng = np.random.RandomState(132)
    for _ in range(4):
        edges = list(
            {(int(rng.randint(15)), int(rng.randint(15))) for _ in range(40)}
        )
        edges = [(min(u, v), max(u, v)) for u, v in edges if u != v]
        edges = sorted(set(edges))
        out = label_propagation(_ds(edges), rounds=4)
        ref = _ref(edges, 4)
        got = dict(zip(out["node"], out["label"]))
        assert got == ref


def test_lpa_community_sizes_sum_to_n():
    from ocr_service_ray.ops.labelprop import label_propagation

    edges = [(0, 1), (1, 2), (3, 4)]
    out = label_propagation(_ds(edges), rounds=3)
    sizes = out.drop_duplicates("label")["community_size"].sum()
    assert sizes == 5


def test_lpa_layout_invariance():
    from ocr_service_ray.ops.labelprop import label_propagation

    rng = np.random.RandomState(5)
    edges = sorted(
        {
            (min(u, v), max(u, v))
            for u, v in (
                (int(rng.randint(12)), int(rng.randint(12)))
                for _ in range(30)
            )
            if u != v
        }
    )
    base = label_propagation(_ds(edges), rounds=3)
    out = label_propagation(_ds(edges[::-1]).repartition(5), rounds=3)
    pd.testing.assert_frame_equal(base, out)
