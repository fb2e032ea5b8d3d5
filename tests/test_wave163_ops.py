"""Wave-163 ops: integer SimRank — closed forms, symmetry/range
invariants, bipartite zero structure, layout invariance."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.simrank import simrank


def test_star_leaves_similar():
    edges = pd.DataFrame({"src": [0, 0, 0], "dst": [1, 2, 3]})
    out = simrank(edges).set_index(["node_a", "node_b"])
    # leaves share the center exactly: C * 1 = 800000
    assert out.loc[(1, 2), "sim_micro"] == 800_000
    assert out.loc[(1, 3), "sim_micro"] == 800_000
    # center-leaf pairs are structurally dissimilar (bipartite): 0,
    # so they are filtered out of the report
    assert (0, 1) not in out.index


def test_path_endpoints():
    edges = pd.DataFrame({"src": [0, 1], "dst": [1, 2]})
    out = simrank(edges).set_index(["node_a", "node_b"])
    assert out.loc[(0, 2), "sim_micro"] == 800_000
    assert (0, 1) not in out.index and (1, 2) not in out.index


def test_square_cycle():
    # C4: opposite corners share both neighbours; adjacent pairs
    # stay 0 (bipartite)
    edges = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    out = simrank(edges).set_index(["node_a", "node_b"])
    assert (0, 1) not in out.index
    v = out.loc[(0, 2), "sim_micro"]
    assert out.loc[(1, 3), "sim_micro"] == v
    # r1: (8*2e6)//(10*4) = 400000; r2: sum = 2*(1e6+s1(0,2)) with
    # s1(0,2)=400000 -> (8*2800000)//40 = 560000; r3: (8*(2e6+2*560000))//40
    assert v == (8 * (2_000_000 + 2 * 560_000)) // 40


def test_invariants_random():
    rng = np.random.RandomState(163)
    for _ in range(6):
        m = int(rng.randint(4, 20))
        src = rng.randint(0, 8, m)
        dst = rng.randint(0, 8, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        out = simrank(edges)
        assert (out["node_a"] < out["node_b"]).all()
        assert ((out["sim_micro"] > 0) & (out["sim_micro"] <= 800_000)).all()
        flipped = edges.rename(columns={"src": "dst", "dst": "src"})
        out2 = simrank(
            pd.concat([flipped.iloc[::-1], edges]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, out2)
