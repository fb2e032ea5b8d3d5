"""Wave-195 ops: dominance relation — CFG closed forms, brute
remove-and-reach parity, diamond/loop structure."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.dominators import dominance_relation


def _df(pairs):
    return pd.DataFrame(
        {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}
    )


def _brute(pairs):
    arcs = {(a, b) for a, b in pairs if a != b}
    nodes = sorted({x for e in arcs for x in e})
    root = nodes[0]
    succ = {}
    for a, b in arcs:
        succ.setdefault(a, set()).add(b)

    def reach(excl=None):
        if excl == root:
            return set()
        seen = {root}
        stk = [root]
        while stk:
            v = stk.pop()
            for u in succ.get(v, ()):
                if u != excl and u not in seen:
                    seen.add(u)
                    stk.append(u)
        return seen

    base = reach()
    rows = set()
    for u in base:
        rows.add((u, u))
        rows.add((u, root))
        for v in nodes:
            if v in (u, root):
                continue
            if u not in reach(excl=v):
                rows.add((u, v))
    return sorted(rows)


def test_chain_everything_dominates_downstream():
    out = dominance_relation(_df([(0, 1), (1, 2), (2, 3)]))
    got = set(zip(out["node"], out["dom"]))
    assert (3, 1) in got and (3, 2) in got and (3, 0) in got
    assert (1, 2) not in got


def test_diamond_join_point_not_dominated_by_branches():
    # 0 -> 1 -> 3, 0 -> 2 -> 3: neither branch dominates the join
    out = dominance_relation(_df([(0, 1), (1, 3), (0, 2), (2, 3)]))
    got = set(zip(out["node"], out["dom"]))
    assert (3, 0) in got and (3, 3) in got
    assert (3, 1) not in got and (3, 2) not in got


def test_loop_back_edge():
    # 0 -> 1 -> 2 -> 1: 1 dominates 2 despite the cycle
    out = dominance_relation(_df([(0, 1), (1, 2), (2, 1)]))
    got = set(zip(out["node"], out["dom"]))
    assert (2, 1) in got


def test_unreachable_excluded():
    out = dominance_relation(_df([(0, 1), (5, 6)]))
    assert set(out["node"]) == {0, 1}


def test_random_vs_brute():
    rng = np.random.RandomState(195)
    for _ in range(12):
        m = int(rng.randint(3, 25))
        pairs = [
            (int(a), int(b))
            for a, b in zip(rng.randint(0, 9, m), rng.randint(0, 9, m))
            if a != b
        ]
        if not pairs:
            continue
        out = dominance_relation(_df(pairs))
        got = sorted(zip(out["node"], out["dom"]))
        assert got == _brute(pairs)
