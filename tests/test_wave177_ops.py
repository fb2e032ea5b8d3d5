"""Wave-177 ops: eccentricity/center/periphery — closed forms, brute
BFS parity, cap semantics."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.eccentricity import eccentricity_table


def test_path_graph():
    edges = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]})
    out = eccentricity_table(edges).set_index("node")
    assert list(out["ecc"]) == [4, 3, 2, 3, 4]
    assert out.loc[2, "is_center"] == 1 and out["is_center"].sum() == 1
    assert out.loc[0, "is_periphery"] == 1 and out["is_periphery"].sum() == 2


def test_star_and_cycle():
    star = pd.DataFrame({"src": [0, 0, 0], "dst": [1, 2, 3]})
    out = eccentricity_table(star).set_index("node")
    assert out.loc[0, "ecc"] == 1 and (out.drop(0)["ecc"] == 2).all()
    cyc = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    out = eccentricity_table(cyc)
    assert (out["ecc"] == 2).all()
    assert (out["is_center"] == 1).all() and (out["is_periphery"] == 1).all()


def test_disconnected_and_cap():
    # two components: cross-component nodes land in n_far
    edges = pd.DataFrame({"src": [0, 5], "dst": [1, 6]})
    out = eccentricity_table(edges).set_index("node")
    assert (out["ecc"] == 1).all()
    assert (out["n_far"] == 2).all()
    # long path beyond cap: far tail counted, ecc capped at 6
    long = pd.DataFrame({"src": list(range(9)), "dst": list(range(1, 10))})
    out = eccentricity_table(long, cap=6).set_index("node")
    assert out.loc[0, "ecc"] == 6
    assert out.loc[0, "n_far"] == 3  # nodes 7, 8, 9 beyond 6 hops


def test_random_vs_brute():
    from collections import deque

    rng = np.random.RandomState(177)
    for _ in range(10):
        m = int(rng.randint(4, 25))
        src = rng.randint(0, 9, m)
        dst = rng.randint(0, 9, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        out = eccentricity_table(edges, cap=6).set_index("node")
        adj = {}
        for a, b in zip(edges["src"], edges["dst"]):
            adj.setdefault(int(a), set()).add(int(b))
            adj.setdefault(int(b), set()).add(int(a))
        for s in adj:
            dist = {s: 0}
            q = deque([s])
            while q:
                u = q.popleft()
                if dist[u] >= 6:
                    continue
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        q.append(v)
            assert out.loc[s, "ecc"] == max(dist.values())
            assert out.loc[s, "n_far"] == len(adj) - len(dist)
