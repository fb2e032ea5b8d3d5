"""Wave-114 ops: HyperBall — registers must equal the HLL of the
exact reachability ball at every radius (merge-of-max invariant)."""

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


def _exact_balls(edges, rounds):
    """BFS reference: ball[v][r] = set reachable from v within r hops."""
    nodes = sorted({x for e in edges for x in e})
    adj = {v: set() for v in nodes}
    for u, v in edges:
        adj[u].add(v)
    balls = {v: [{v}] for v in nodes}
    for r in range(1, rounds + 1):
        for v in nodes:
            cur = set(balls[v][r - 1])
            for u in balls[v][r - 1]:
                cur |= adj[u]
            balls[v].append(cur)
    return nodes, balls


def _regs_of_set(members, p=4):
    from ocr_service_ray.ops.hyperball import _node_regs

    regs = np.zeros(1 << p, dtype=np.int64)
    for m in members:
        np.maximum(regs, _node_regs(m, p), out=regs)
    return regs


def test_hyperball_equals_hll_of_exact_ball():
    from ocr_service_ray.ops.hyperball import _est_micro, hyperball_rounds

    rng = np.random.RandomState(114)
    edges = list(
        {
            (int(rng.randint(15)), int(rng.randint(15)))
            for _ in range(40)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    rounds = 3
    out = hyperball_rounds(_ds(edges), rounds=rounds, p=4)
    nodes, balls = _exact_balls(edges, rounds)
    for _, row in out.iterrows():
        regs = _regs_of_set(balls[row["node"]][row["radius"]])
        assert row["reg_sum"] == int(regs.sum())
        assert row["est_micro"] == _est_micro(regs, 4)


def test_hyperball_monotone_and_saturating():
    from ocr_service_ray.ops.hyperball import hyperball_rounds

    # a 4-chain: ball grows one hop per round then saturates
    out = hyperball_rounds(_ds([(0, 1), (1, 2), (2, 3)]), rounds=4, p=4)
    n0 = out[out["node"] == 0].sort_values("radius")
    sums = n0["reg_sum"].tolist()
    assert sums == sorted(sums)  # monotone nondecreasing
    assert sums[3] == sums[4]  # saturated at graph diameter
    # node 3 has no out-edges: its ball never grows
    n3 = out[out["node"] == 3]["reg_sum"].unique()
    assert len(n3) == 1


def test_hyperball_layout_invariance():
    from ocr_service_ray.ops.hyperball import hyperball_rounds

    rng = np.random.RandomState(9)
    edges = [(u, v) for u, v in {(int(rng.randint(12)), int(rng.randint(12))) for _ in range(30)} if u != v]
    base = hyperball_rounds(_ds(edges), rounds=2, p=4)
    out = hyperball_rounds(_ds(edges[::-1]).repartition(5), rounds=2, p=4)
    pd.testing.assert_frame_equal(base, out)
