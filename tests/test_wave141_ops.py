"""Wave-141 ops: Weisfeiler-Lehman color refinement — closed forms,
symmetry-orbit structure, independent recomputation, layout
invariance."""

import hashlib

import pandas as pd


def _wl_ref(adj, rounds):
    """Independent dict-based recomputation of the WL contract."""
    color = {v: str(len(adj[v])) for v in adj}
    for _ in range(rounds):
        color = {
            v: hashlib.md5(
                (color[v] + "|" + ",".join(sorted(color[u] for u in adj[v]))).encode()
            ).hexdigest()
            for v in adj
        }
    return color


def test_wl_path_graph_orbits():
    from ocr_service_ray.ops.wl import wl_refine

    # P3: endpoints are one WL orbit, the center another
    edges = pd.DataFrame({"src": [0, 1], "dst": [1, 2]})
    out = wl_refine(edges, rounds=3).set_index("node")
    assert out.loc[0, "color3"] == out.loc[2, "color3"]
    assert out.loc[1, "color3"] != out.loc[0, "color3"]
    assert out.loc[0, "class_size"] == 2
    assert out.loc[1, "class_size"] == 1
    assert list(out["degree"]) == [1, 2, 1]


def test_wl_cycle_is_one_class():
    from ocr_service_ray.ops.wl import wl_refine

    # vertex-transitive graph: every round keeps a single color class
    n = 6
    edges = pd.DataFrame(
        {"src": list(range(n)), "dst": [(i + 1) % n for i in range(n)]}
    )
    out = wl_refine(edges, rounds=3)
    for c in ("color1", "color2", "color3"):
        assert out[c].nunique() == 1
    assert (out["class_size"] == n).all()


def test_wl_star_center_vs_leaves():
    from ocr_service_ray.ops.wl import wl_refine

    edges = pd.DataFrame({"src": [0, 0, 0], "dst": [1, 2, 3]})
    out = wl_refine(edges, rounds=2).set_index("node")
    assert out.loc[1, "color2"] == out.loc[2, "color2"] == out.loc[3, "color2"]
    assert out.loc[0, "color2"] != out.loc[1, "color2"]


def test_wl_matches_independent_reference():
    import numpy as np

    from ocr_service_ray.ops.wl import wl_refine

    rng = np.random.RandomState(141)
    src = rng.randint(0, 12, 40)
    dst = rng.randint(0, 12, 40)
    keep = src != dst
    edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
    adj = {}
    for a, b in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    ref = _wl_ref(adj, 3)
    out = wl_refine(edges, rounds=3)
    got = dict(zip(out["node"], out["color3"]))
    assert got == ref


def test_wl_layout_invariance():
    import numpy as np

    from ocr_service_ray.ops.wl import wl_refine

    rng = np.random.RandomState(7)
    src = rng.randint(0, 9, 25)
    dst = rng.randint(0, 9, 25)
    keep = src != dst
    edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
    a = wl_refine(edges, rounds=3)
    # shuffled rows, reversed orientation, duplicated edges: same output
    flipped = edges.rename(columns={"src": "dst", "dst": "src"})
    b = wl_refine(
        pd.concat([flipped.iloc[::-1], edges]).reset_index(drop=True), rounds=3
    )
    pd.testing.assert_frame_equal(a, b)
