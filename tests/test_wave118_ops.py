"""Wave-118 ops: Luby MIS — independence + maximality invariants,
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


def _reference_mis(edges, rounds=8):
    """Single-process replay of the same deterministic rule."""
    from ocr_service_ray.ops.mis import _prio

    nodes = sorted({x for e in edges for x in e})
    adj = {v: set() for v in nodes}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    state = {v: 0 for v in nodes}
    rd_ = {v: 0 for v in nodes}
    for r in range(1, rounds + 1):
        new_in = [
            v
            for v in nodes
            if state[v] == 0
            and all(
                state[u] != 0 or _prio(u) < _prio(v) for u in adj[v]
            )
        ]
        if not new_in:
            break
        for v in new_in:
            state[v] = 1
            rd_[v] = r
        for v in new_in:
            for u in adj[v]:
                if state[u] == 0:
                    state[u] = -1
                    rd_[u] = r
    return state, rd_


def _check_invariants(edges, out):
    in_mis = set(out.loc[out["in_mis"] == 1, "node"])
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    # independence: no two MIS nodes adjacent
    for v in in_mis:
        assert not (adj.get(v, set()) & in_mis)
    # maximality: every non-MIS node has a MIS neighbour
    for v in out["node"]:
        if v not in in_mis:
            assert adj.get(int(v), set()) & in_mis, f"node {v} not dominated"


def test_luby_mis_random_graphs():
    from ocr_service_ray.ops.mis import luby_mis

    rng = np.random.RandomState(118)
    for n, m in [(10, 20), (30, 60), (50, 70)]:
        edges = list(
            {
                (int(rng.randint(n)), int(rng.randint(n)))
                for _ in range(m)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        out = luby_mis(_ds(edges), rounds=8)
        _check_invariants(edges, out)
        state, rd_ = _reference_mis(edges)
        for _, row in out.iterrows():
            v = int(row["node"])
            assert row["in_mis"] == (1 if state[v] == 1 else 0)
            assert row["round_decided"] == (rd_[v] if state[v] != 0 else 9)


def test_luby_mis_star_graph():
    from ocr_service_ray.ops.mis import _prio, luby_mis

    # star: either the hub alone, or all leaves — decided by priority
    edges = [(0, i) for i in range(1, 8)]
    out = luby_mis(_ds(edges), rounds=6)
    in_mis = set(out.loc[out["in_mis"] == 1, "node"])
    if _prio(0) > max(_prio(i) for i in range(1, 8)):
        assert in_mis == {0}
    else:
        assert 0 not in in_mis and in_mis == set(range(1, 8))


def test_luby_mis_layout_invariance():
    from ocr_service_ray.ops.mis import luby_mis

    rng = np.random.RandomState(5)
    edges = [
        (u, v)
        for u, v in {
            (int(rng.randint(20)), int(rng.randint(20))) for _ in range(40)
        }
        if u != v
    ]
    base = luby_mis(_ds(edges), rounds=6)
    out = luby_mis(_ds(edges[::-1]).repartition(5), rounds=6)
    pd.testing.assert_frame_equal(base, out)
