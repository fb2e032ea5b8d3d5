"""Wave-186 ops: Cochran's Q — worked example, degenerate rows,
sanity vs direct formula."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.cochran import cochran_q


def _pres(rows):
    return pd.DataFrame(rows, columns=["u", "t"])


def test_worked_example():
    # 4 blocks, 3 treatments; presence:
    # u1: A, B; u2: A; u3: A, B, C; u4: B
    rows = [(1, "A"), (1, "B"), (2, "A"), (3, "A"), (3, "B"), (3, "C"), (4, "B")]
    out = cochran_q(_pres(rows), "u", "t", ["A", "B", "C"]).iloc[0]
    G = {"A": 3, "B": 3, "C": 1}
    L = {1: 2, 2: 1, 3: 3, 4: 1}
    sg, sg2 = sum(G.values()), sum(v * v for v in G.values())
    sl, sl2 = sum(L.values()), sum(v * v for v in L.values())
    assert out["q_num"] == 2 * (3 * sg2 - sg * sg)
    assert out["q_den"] == 3 * sl - sl2
    assert out["k"] == 3 and out["n_blocks"] == 4


def test_uniform_presence_zero_numerator():
    # every block has every treatment: G equal, L = k -> q_num = 0
    rows = [(u, t) for u in (1, 2, 3) for t in ("A", "B")]
    out = cochran_q(_pres(rows), "u", "t", ["A", "B"]).iloc[0]
    assert out["q_num"] == 0
    assert out["q_den"] == 0  # all-constant rows: denominator 0 too


def test_skewed_treatment_positive_q():
    # treatment A always present, B never: maximal heterogeneity
    rows = [(u, "A") for u in range(6)]
    out = cochran_q(_pres(rows), "u", "t", ["A", "B"]).iloc[0]
    assert out["q_num"] > 0
    assert out["q_den"] == 2 * 6 - 6  # each L=1: 2*6 - 6


def test_random_formula_parity():
    rng = np.random.RandomState(186)
    for _ in range(10):
        rows = [
            (u, t)
            for u in range(8)
            for t in "ABCD"
            if rng.rand() < 0.5
        ]
        out = cochran_q(_pres(rows), "u", "t", list("ABCD")).iloc[0]
        X = np.zeros((8, 4), np.int64)
        for u, t in rows:
            X[u, "ABCD".index(t)] = 1
        G, L = X.sum(0), X.sum(1)
        assert out["q_num"] == 3 * (4 * int((G * G).sum()) - int(G.sum()) ** 2)
        assert out["q_den"] == 4 * int(L.sum()) - int((L * L).sum())
