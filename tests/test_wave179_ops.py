"""Wave-179 ops: targeted-attack percolation — closed forms,
monotonicity, brute parity."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.percolation import attack_curve


def test_star_collapse():
    # star: removing the hub shatters everything
    edges = pd.DataFrame({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    out = attack_curve(edges, k_max=2).set_index("k")
    assert out.loc[0, "giant_size"] == 5
    assert out.loc[1, "removed_node"] == 0
    assert out.loc[1, "giant_size"] == 1
    assert out.loc[1, "n_components"] == 4


def test_cycle_is_robust():
    n = 6
    edges = pd.DataFrame(
        {"src": list(range(n)), "dst": [(i + 1) % n for i in range(n)]}
    )
    out = attack_curve(edges, k_max=2).set_index("k")
    # equal degrees: ties remove smallest ids 0 then 1
    assert out.loc[1, "removed_node"] == 0
    assert out.loc[1, "giant_size"] == 5  # cycle minus one = path
    assert out.loc[2, "giant_size"] == 4  # removing adjacent 1 leaves P4


def test_monotone_giant():
    rng = np.random.RandomState(179)
    for _ in range(8):
        m = int(rng.randint(5, 30))
        src = rng.randint(0, 10, m)
        dst = rng.randint(0, 10, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        out = attack_curve(edges, k_max=5)
        g = list(out["giant_size"])
        assert all(a >= b for a, b in zip(g, g[1:]))
        # removed nodes follow (degree desc, id asc) on ORIGINAL deg
        adj = {}
        for a, b in zip(edges["src"], edges["dst"]):
            adj.setdefault(int(a), set()).add(int(b))
            adj.setdefault(int(b), set()).add(int(a))
        order = sorted(adj, key=lambda v: (-len(adj[v]), v))
        got = [r for r in out["removed_node"] if r >= 0]
        assert got == order[: len(got)]
