"""Wave-125 ops: temporal earliest arrival — time-respecting
semantics vs static reachability, reference parity, layout."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(edges):
    import ray.data as rd

    s, d, t = zip(*edges)
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(s, type=pa.int64()),
                "dst": pa.array(d, type=pa.int64()),
                "t": pa.array(t, type=pa.int64()),
            }
        )
    )


def _ref(edges, source, rounds):
    INF = 1 << 60
    nodes = sorted({x for s, d, _ in edges for x in (s, d)})
    arr = {v: INF for v in nodes}
    arr[source] = 0
    for _ in range(rounds):
        prev = dict(arr)
        for s, d, t in edges:
            if t >= prev[s] and t < arr[d]:
                arr[d] = min(arr[d], t)
        # Jacobi: candidates computed against prev snapshot
        arr = {
            v: min(
                arr[v],
                min(
                    [t for s, d, t in edges if d == v and t >= prev[s]],
                    default=INF,
                ),
            )
            for v in nodes
        }
    return {v: (arr[v] if arr[v] != INF else -1) for v in nodes}


def test_temporal_blocks_time_decreasing_paths():
    from ocr_service_ray.ops.temporal import earliest_arrival

    # 0 -(day 10)-> 1 -(day 5)-> 2 : static BFS reaches 2, temporal must NOT
    out = earliest_arrival(_ds([(0, 1, 10), (1, 2, 5)]), source=0, rounds=4)
    got = dict(zip(out["node"], out["arrival"]))
    assert got[1] == 10
    assert got[2] == -1
    # with the later parallel edge the path opens
    out2 = earliest_arrival(
        _ds([(0, 1, 10), (1, 2, 5), (1, 2, 12)]), source=0, rounds=4
    )
    assert dict(zip(out2["node"], out2["arrival"]))[2] == 12


def test_temporal_waiting_allowed_and_min_chosen():
    from ocr_service_ray.ops.temporal import earliest_arrival

    # two routes to 2: via 1 arriving day 7, direct day 9 -> pick 7
    out = earliest_arrival(
        _ds([(0, 1, 3), (1, 2, 7), (0, 2, 9)]), source=0, rounds=4
    )
    got = dict(zip(out["node"], out["arrival"]))
    assert got[2] == 7


def test_temporal_random_vs_reference():
    from ocr_service_ray.ops.temporal import earliest_arrival

    rng = np.random.RandomState(125)
    for _ in range(5):
        edges = [
            (int(rng.randint(10)), int(rng.randint(10)), int(rng.randint(1, 50)))
            for _ in range(40)
        ]
        edges = [(s, d, t) for s, d, t in edges if s != d]
        out = earliest_arrival(_ds(edges), source=0, rounds=4)
        ref = _ref(edges, 0, 4)
        got = dict(zip(out["node"], out["arrival"]))
        assert got == ref


def test_temporal_layout_invariance():
    from ocr_service_ray.ops.temporal import earliest_arrival

    rng = np.random.RandomState(6)
    edges = [
        (int(rng.randint(8)), int(rng.randint(8)), int(rng.randint(1, 30)))
        for _ in range(25)
    ]
    edges = [(s, d, t) for s, d, t in edges if s != d]
    base = earliest_arrival(_ds(edges), source=0, rounds=3)
    out = earliest_arrival(_ds(edges[::-1]).repartition(5), source=0, rounds=3)
    pd.testing.assert_frame_equal(base, out)
