"""Wave-155 ops: stress centrality — closed forms, brute all-paths
enumeration parity, cap semantics."""

import itertools

import numpy as np
import pandas as pd

from ocr_service_ray.ops.stress import stress_centrality


def _brute(edges, cap=6):
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    nodes = sorted(adj)
    stress = {v: 0 for v in nodes}

    def all_shortest_paths(s, t):
        # BFS then DFS over the predecessor DAG
        from collections import deque

        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        if t not in dist or dist[t] > cap:
            return []
        paths = []

        def dfs(v, acc):
            if v == s:
                paths.append([s] + acc)
                return
            for u in adj[v]:
                if dist.get(u) == dist[v] - 1:
                    dfs(u, [v] + acc)

        dfs(t, [])
        return paths

    for s, t in itertools.combinations(nodes, 2):
        for p in all_shortest_paths(s, t):
            for v in p[1:-1]:
                stress[v] += 1
    return pd.DataFrame(
        {
            "node": nodes,
            "degree": [len(adj[v]) for v in nodes],
            "stress": [stress[v] for v in nodes],
        }
    ).astype("int64")


def test_path_graph():
    # P4: middle nodes relay; stress(1) = paths 0-2,0-3 = 2; by
    # symmetry stress(2) = 2
    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    out = stress_centrality(edges).set_index("node")
    assert out.loc[0, "stress"] == 0 and out.loc[3, "stress"] == 0
    assert out.loc[1, "stress"] == 2 and out.loc[2, "stress"] == 2


def test_star_center_carries_all():
    edges = pd.DataFrame({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    out = stress_centrality(edges).set_index("node")
    assert out.loc[0, "stress"] == 6  # C(4,2) leaf pairs
    assert (out.drop(0)["stress"] == 0).all()


def test_parallel_shortest_paths_counted():
    # diamond 0-1-3, 0-2-3: two shortest 0-3 paths; each middle
    # node carries one
    edges = pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 2, 3, 3]})
    out = stress_centrality(edges).set_index("node")
    assert out.loc[1, "stress"] == 1 and out.loc[2, "stress"] == 1


def test_random_vs_brute():
    rng = np.random.RandomState(155)
    for _ in range(10):
        m = int(rng.randint(4, 25))
        src = rng.randint(0, 9, m)
        dst = rng.randint(0, 9, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        got = stress_centrality(edges, cap=6)
        pd.testing.assert_frame_equal(got, _brute(edges, cap=6))
