"""Wave-176 ops: integer Katz — closed forms, walk-count parity vs
matrix powers, attenuation ordering."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.katz import katz_scores


def test_chain_walk_counts():
    # 0 -> 1 -> 2: w1(1)=1, w1(2)=1; w2(2)=1; no longer walks
    edges = pd.DataFrame({"src": [0, 1], "dst": [1, 2]})
    out = katz_scores(edges).set_index("node")
    # katz = sum w_k * 4^(4-k): node1: 1*64; node2: 64 + 16
    assert out.loc[0, "katz_num"] == 0
    assert out.loc[1, "katz_num"] == 64
    assert out.loc[2, "katz_num"] == 80


def test_matches_matrix_powers():
    rng = np.random.RandomState(176)
    for _ in range(10):
        m = int(rng.randint(3, 25))
        src = rng.randint(0, 8, m)
        dst = rng.randint(0, 8, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        arcs = {(int(a), int(b)) for a, b in zip(edges["src"], edges["dst"])}
        nodes = sorted({x for e in arcs for x in e})
        idx = {v: i for i, v in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)), np.int64)
        for a, b in arcs:
            A[idx[a], idx[b]] = 1
        ones = np.ones(len(nodes), np.int64)
        expect = np.zeros(len(nodes), np.int64)
        w = ones
        for k in range(1, 5):
            w = w @ A
            expect += w * 4 ** (4 - k)
        out = katz_scores(edges)
        got = dict(zip(out["node"], out["katz_num"]))
        for v in nodes:
            assert got[v] == expect[idx[v]]


def test_cycle_symmetry():
    n = 5
    edges = pd.DataFrame(
        {"src": list(range(n)), "dst": [(i + 1) % n for i in range(n)]}
    )
    out = katz_scores(edges)
    assert out["katz_num"].nunique() == 1  # rotational symmetry
    assert (out["katz_num"] == 64 + 16 + 4 + 1).all()
