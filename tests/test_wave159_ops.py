"""Wave-159 ops: modularity decomposition — hand-worked two-clique
value, accounting identities, random consistency."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.modularity import modularity_decomposition


def _und(pairs):
    return pd.DataFrame(
        {"src": [min(a, b) for a, b in pairs], "dst": [max(a, b) for a, b in pairs]}
    )


def test_two_cliques_bridged():
    # K3 {0,1,2} + K3 {3,4,5} + bridge (2,3): m = 7
    pairs = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    labels = pd.DataFrame(
        {"node": [0, 1, 2, 3, 4, 5], "label": [0, 0, 0, 3, 3, 3]}
    )
    out = modularity_decomposition(_und(pairs), labels).set_index("label")
    # community 0: e_in=3, degrees 2+2+3=7 -> 4*7*3 - 49 = 35
    assert out.loc[0, "internal_edges"] == 3
    assert out.loc[0, "degree_sum"] == 7
    assert out.loc[0, "contrib_num"] == 35
    assert out.loc[3, "contrib_num"] == 35
    # Q = 70 / (4*49) = 5/14 ~ 0.357, a good partition
    assert out["contrib_num"].sum() == 70
    assert (out["m_edges"] == 7).all()


def test_single_community_zero_q():
    # everything in one community: Q = e/m - 1 = 0 exactly
    pairs = [(0, 1), (1, 2), (0, 2)]
    labels = pd.DataFrame({"node": [0, 1, 2], "label": [0, 0, 0]})
    out = modularity_decomposition(_und(pairs), labels)
    m = 3
    assert out["contrib_num"].sum() == 4 * m * 3 - (2 * m) ** 2  # = 0


def test_accounting_identities():
    rng = np.random.RandomState(159)
    for _ in range(10):
        n = int(rng.randint(4, 12))
        pairs = set()
        for _ in range(int(rng.randint(3, 20))):
            a, b = rng.randint(0, n, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        nodes = sorted({v for p in pairs for v in p})
        labels = pd.DataFrame(
            {"node": nodes, "label": [v % 3 for v in nodes]}
        )
        out = modularity_decomposition(_und(pairs), labels)
        m = len(pairs)
        assert (out["m_edges"] == m).all()
        assert out["internal_edges"].sum() <= m
        assert out["degree_sum"].sum() == 2 * m
        # Q <= 1 in numerator terms
        assert out["contrib_num"].sum() <= 4 * m * m
