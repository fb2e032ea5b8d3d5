"""Wave-180 ops: attribute mixing / Newman assortativity — perfect
homophily/heterophily closed forms, stub accounting, range."""

from fractions import Fraction

import pandas as pd

from ocr_service_ray.ops.mixing import mixing_assortativity


def _df(pairs):
    return pd.DataFrame(
        {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}
    )


def test_perfect_homophily():
    # two monochromatic components: r = 1
    cls = {0: 0, 1: 0, 2: 1, 3: 1}
    out = mixing_assortativity(_df([(0, 1), (2, 3)]), cls)
    r = Fraction(int(out["r_num"].iloc[0]), int(out["r_den"].iloc[0]))
    assert r == 1


def test_perfect_heterophily_bipartite():
    # complete bipartite between classes: r = -1 for 2 balanced
    # classes
    cls = {0: 0, 1: 0, 10: 1, 11: 1}
    out = mixing_assortativity(
        _df([(0, 10), (0, 11), (1, 10), (1, 11)]), cls
    )
    r = Fraction(int(out["r_num"].iloc[0]), int(out["r_den"].iloc[0]))
    assert r == -1


def test_stub_accounting_and_symmetry():
    cls = {0: 0, 1: 0, 2: 1, 3: 2}
    out = mixing_assortativity(
        _df([(0, 1), (0, 2), (1, 3), (2, 3)]), cls
    )
    assert out["n_stubs"].sum() == 8  # 2 per undirected edge
    m = out.set_index(["class_a", "class_b"])["n_stubs"]
    for (a, b), v in m.items():
        assert m[(b, a)] == v  # matrix symmetry
    # r within [-1, 1]
    r = Fraction(int(out["r_num"].iloc[0]), int(out["r_den"].iloc[0]))
    assert -1 <= r <= 1


def test_matches_fraction_reference():
    import numpy as np

    rng = np.random.RandomState(180)
    for _ in range(10):
        m = int(rng.randint(3, 20))
        src = rng.randint(0, 9, m)
        dst = rng.randint(0, 9, m)
        keep = src != dst
        pairs = list(zip(src[keep], dst[keep]))
        if not pairs:
            continue
        cls = {v: v % 3 for v in range(9)}
        out = mixing_assortativity(_df(pairs), cls)
        # reference via normalized e matrix
        stubs = {}
        und = set()
        for a, b in pairs:
            a, b = int(a), int(b)
            if a != b:
                und.add((a, b))
                und.add((b, a))
        for a, b in und:
            k = (cls[a], cls[b])
            stubs[k] = stubs.get(k, 0) + 1
        m2 = sum(stubs.values())
        classes = sorted({c for k in stubs for c in k})
        e = {k: Fraction(v, m2) for k, v in stubs.items()}
        tr = sum(e.get((c, c), Fraction(0)) for c in classes)
        ab = sum(
            sum(e.get((c, j), Fraction(0)) for j in classes)
            * sum(e.get((i, c), Fraction(0)) for i in classes)
            for c in classes
        )
        expect = (tr - ab) / (1 - ab) if ab != 1 else Fraction(0)
        got = Fraction(int(out["r_num"].iloc[0]), int(out["r_den"].iloc[0]))
        if ab != 1:
            assert got == expect
