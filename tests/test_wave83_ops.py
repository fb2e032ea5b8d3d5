"""Wave-83: HITS hubs/authorities — integer recursion equality vs a
numpy reference, structural sanity on a star graph, layout
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocr_service_ray.ops.hits import SCALE, hits


def _numpy_hits(edges, iters=2):
    """Reference: same integer half-rounds, dense."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    hub = np.full(len(nodes), SCALE, dtype=object)
    auth = np.zeros(len(nodes), dtype=object)

    def half(score, frm_is_src):
        raw = np.zeros(len(nodes), dtype=object)
        for u, v, w in edges:
            if frm_is_src:
                raw[idx[v]] += int(score[idx[u]]) * w
            else:
                raw[idx[u]] += int(score[idx[v]]) * w
        tot = int(raw.sum())
        if tot == 0:
            return raw
        return np.array([(SCALE * int(x)) // tot for x in raw], dtype=object)

    for _ in range(iters):
        auth = half(hub, True)
        hub = half(auth, False)
    return pd.DataFrame(
        {
            "node": nodes,
            "hub_ppm": [int(x) for x in hub],
            "auth_ppm": [int(x) for x in auth],
        }
    )


def _ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([e[2] for e in edges], pa.int64()),
            }
        )
    )


def test_hits_matches_numpy_reference():
    rng = np.random.RandomState(7)
    edges = []
    seen = set()
    for _ in range(60):
        u, v = int(rng.randint(0, 12)), int(rng.randint(0, 12))
        if u != v and (u, v) not in seen:
            seen.add((u, v))
            edges.append((u, v, int(rng.randint(1, 9))))
    got = hits(_ds(edges), weight_col="w", iters=2)
    ref = _numpy_hits(edges, iters=2)
    assert got["node"].tolist() == ref["node"].tolist()
    assert got["hub_ppm"].tolist() == ref["hub_ppm"].tolist()
    assert got["auth_ppm"].tolist() == ref["auth_ppm"].tolist()


def test_hits_star_graph_structure():
    """Star: 1..4 all point at 0. Node 0 is the sole authority; the
    spokes share hub mass by weight; node 0 has hub 0 (no out-edges)."""
    edges = [(1, 0, 1), (2, 0, 1), (3, 0, 2), (4, 0, 1)]
    got = hits(_ds(edges), weight_col="w", iters=2).set_index("node")
    assert int(got.loc[0, "auth_ppm"]) == SCALE  # all authority mass
    assert int(got.loc[0, "hub_ppm"]) == 0
    for spoke in (1, 2, 4):
        assert int(got.loc[spoke, "auth_ppm"]) == 0
    # weight-2 spoke gets twice the hub mass of a weight-1 spoke
    assert int(got.loc[3, "hub_ppm"]) == 2 * int(got.loc[1, "hub_ppm"])


def test_hits_layout_invariance():
    """Result is identical under a different block layout."""
    edges = [(0, 1, 3), (1, 2, 1), (2, 0, 2), (0, 2, 1), (2, 1, 5)]
    a = hits(_ds(edges), weight_col="w", iters=2)
    b = hits(_ds(edges).repartition(4), weight_col="w", iters=2)
    assert a.values.tolist() == b.values.tolist()
