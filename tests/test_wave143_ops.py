"""Wave-143 ops: Tarjan SCC — closed forms, random parity vs a
boolean-closure reference, layout invariance."""

import numpy as np
import pandas as pd


def _brute(edges, n_max=12):
    arcs = {
        (int(a), int(b))
        for a, b in zip(edges["src"], edges["dst"])
        if int(a) != int(b)
    }
    nodes = sorted({v for e in arcs for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    R = np.eye(n, dtype=bool)
    for a, b in arcs:
        R[idx[a], idx[b]] = True
    for _ in range(n):
        R = R | (R @ R)
    M = R & R.T
    rows = []
    for v in nodes:
        mem = [nodes[j] for j in range(n) if M[idx[v], j]]
        rows.append((v, min(mem), len(mem), int(len(mem) > 1)))
    return pd.DataFrame(
        rows, columns=["node", "scc_id", "scc_size", "in_cycle"]
    ).astype("int64")


def test_directed_cycle_is_one_scc():
    from ocr_service_ray.ops.scc import tarjan_scc

    n = 5
    edges = pd.DataFrame(
        {"src": list(range(n)), "dst": [(i + 1) % n for i in range(n)]}
    )
    out = tarjan_scc(edges)
    assert (out["scc_id"] == 0).all()
    assert (out["scc_size"] == n).all()
    assert (out["in_cycle"] == 1).all()


def test_dag_is_all_singletons():
    from ocr_service_ray.ops.scc import tarjan_scc

    edges = pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 2, 3, 3]})
    out = tarjan_scc(edges)
    assert (out["scc_size"] == 1).all()
    assert (out["in_cycle"] == 0).all()
    assert list(out["scc_id"]) == list(out["node"])


def test_two_cycles_bridged_one_way():
    from ocr_service_ray.ops.scc import tarjan_scc

    # cycle {0,1,2} -> cycle {5,6}: one-way bridge keeps them separate
    edges = pd.DataFrame(
        {"src": [0, 1, 2, 2, 5, 6], "dst": [1, 2, 0, 5, 6, 5]}
    )
    out = tarjan_scc(edges).set_index("node")
    assert out.loc[0, "scc_id"] == out.loc[1, "scc_id"] == 0
    assert out.loc[5, "scc_id"] == out.loc[6, "scc_id"] == 5
    assert out.loc[0, "scc_size"] == 3
    assert out.loc[5, "scc_size"] == 2


def test_random_vs_brute_and_layout():
    from ocr_service_ray.ops.scc import tarjan_scc

    rng = np.random.RandomState(143)
    for _ in range(10):
        m = int(rng.randint(4, 35))
        src = rng.randint(0, 10, m)
        dst = rng.randint(0, 10, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        got = tarjan_scc(edges)
        pd.testing.assert_frame_equal(got, _brute(edges))
        again = tarjan_scc(
            pd.concat([edges.iloc[::-1], edges]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, again)
