"""Wave-142 ops: articulation points + bridges — closed forms,
random parity vs brute remove-and-recount, layout invariance."""

import numpy as np
import pandas as pd


def _brute(edges):
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)

    def ncomp(exclude_v=None, exclude_e=None):
        seen, c = set(), 0
        for s in nodes:
            if s == exclude_v or s in seen:
                continue
            c += 1
            stk = [s]
            seen.add(s)
            while stk:
                x = stk.pop()
                for u in adj[x]:
                    if u == exclude_v or u in seen:
                        continue
                    if exclude_e and {x, u} == set(exclude_e):
                        continue
                    seen.add(u)
                    stk.append(u)
        return c

    base = ncomp()
    bdeg = {v: 0 for v in nodes}
    for a, b in pairs:
        if ncomp(exclude_e=(a, b)) > base:
            bdeg[a] += 1
            bdeg[b] += 1
    rows = []
    for v in nodes:
        delta = ncomp(exclude_v=v) - base
        rows.append((v, len(adj[v]), int(delta > 0), delta, bdeg[v]))
    return pd.DataFrame(
        rows,
        columns=["node", "degree", "is_articulation", "comp_delta", "bridge_deg"],
    ).astype("int64")


def test_path_internal_nodes_cut():
    from ocr_service_ray.ops.articulation import articulation_bridges

    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    out = articulation_bridges(edges).set_index("node")
    assert list(out["is_articulation"]) == [0, 1, 1, 0]
    # every path edge is a bridge
    assert list(out["bridge_deg"]) == [1, 2, 2, 1]


def test_cycle_has_no_cuts_or_bridges():
    from ocr_service_ray.ops.articulation import articulation_bridges

    n = 7
    edges = pd.DataFrame(
        {"src": list(range(n)), "dst": [(i + 1) % n for i in range(n)]}
    )
    out = articulation_bridges(edges)
    assert (out["is_articulation"] == 0).all()
    assert (out["bridge_deg"] == 0).all()
    assert (out["comp_delta"] == 0).all()


def test_two_triangles_sharing_vertex():
    from ocr_service_ray.ops.articulation import articulation_bridges

    # bowtie: triangles 0-1-2 and 2-3-4 share vertex 2
    edges = pd.DataFrame(
        {"src": [0, 1, 0, 2, 3, 2], "dst": [1, 2, 2, 3, 4, 4]}
    )
    out = articulation_bridges(edges).set_index("node")
    assert out.loc[2, "is_articulation"] == 1
    assert out.loc[2, "comp_delta"] == 1
    assert out["is_articulation"].sum() == 1
    assert (out["bridge_deg"] == 0).all()


def test_star_center_split():
    from ocr_service_ray.ops.articulation import articulation_bridges

    edges = pd.DataFrame({"src": [9, 9, 9, 9], "dst": [1, 2, 3, 4]})
    out = articulation_bridges(edges).set_index("node")
    assert out.loc[9, "comp_delta"] == 3  # 4 leaves - the 1 it was
    assert out.loc[9, "bridge_deg"] == 4
    assert (out.drop(9)["is_articulation"] == 0).all()


def test_random_vs_brute_and_layout():
    from ocr_service_ray.ops.articulation import articulation_bridges

    rng = np.random.RandomState(142)
    for trial in range(8):
        m = int(rng.randint(5, 30))
        src = rng.randint(0, 10, m)
        dst = rng.randint(0, 10, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        got = articulation_bridges(edges)
        pd.testing.assert_frame_equal(got, _brute(edges))
        flipped = edges.rename(columns={"src": "dst", "dst": "src"})
        again = articulation_bridges(flipped.iloc[::-1].reset_index(drop=True))
        pd.testing.assert_frame_equal(got, again)
