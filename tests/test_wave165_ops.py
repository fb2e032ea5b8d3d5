"""Wave-165 ops: Selinger join ordering — hand-worked chain costs,
cross-join exclusion, determinism, plan-count accounting."""

import pandas as pd

from ocr_service_ray.ops.joinorder import best_join_order


def _chain(tables, edges):
    return best_join_order(tables, edges)


def test_chain_plan_count():
    # chain a-b-c-d: valid left-deep cross-free orders = start
    # anywhere, grow the interval: 8 orders
    out = _chain(
        {"a": 10, "b": 10, "c": 10, "d": 10},
        [("a", "b", 10, 10), ("b", "c", 10, 10), ("c", "d", 10, 10)],
    )
    assert out.loc[0, "n_plans"] == 8


def test_small_table_first_wins():
    # orders:lineitem fanout large; starting from the tiny side
    # keeps intermediates small
    out = _chain(
        {"c": 100, "o": 1000, "l": 10000, "s": 10},
        [("c", "o", 100, 90), ("o", "l", 1000, 950), ("l", "s", 10, 10)],
    )
    # verify the reported best really is min over a manual
    # enumeration
    import itertools

    tables = {"c": 100, "o": 1000, "l": 10000, "s": 10}
    edges = {("c", "o"): (100, 90), ("o", "l"): (1000, 950), ("l", "s"): (10, 10)}
    und = {}
    for (a, b), (da, db) in edges.items():
        und.setdefault(a, {})[b] = (da, db)
        und.setdefault(b, {})[a] = (db, da)
    best = None
    for perm in itertools.permutations(tables):
        S, card, cost, ok = [perm[0]], tables[perm[0]], 0, True
        for t in perm[1:]:
            nbrs = [n for n in S if n in und.get(t, {})]
            if not nbrs:
                ok = False
                break
            n = min(nbrs)
            dt, dn = und[t][n]
            est = card * tables[t] // max(dt, dn)
            cost += est
            card = est
            S.append(t)
        if ok:
            key = (cost, ",".join(S))
            if best is None or key < best:
                best = key
    assert out.loc[0, "best_cost"] == best[0]
    assert out.loc[0, "best_order"] == best[1]


def test_deterministic_tie_order():
    # fully symmetric chain: several plans tie at min cost; the
    # smallest order string wins
    out = _chain(
        {"p": 5, "q": 5, "r": 5},
        [("p", "q", 5, 5), ("q", "r", 5, 5)],
    )
    assert out.loc[0, "n_plans"] == 4  # p,q,r / q,p,r / q,r,p / r,q,p
    # all costs equal -> lexicographically smallest valid order
    assert out.loc[0, "best_order"] == "p,q,r"
    assert out.loc[0, "best_cost"] == out.loc[0, "worst_cost"]


def test_star_schema():
    # star: fact f joins dims x,y (no x-y edge): orders through f
    out = _chain(
        {"f": 1000, "x": 10, "y": 20},
        [("f", "x", 10, 10), ("f", "y", 20, 20)],
    )
    # valid: f,x,y / f,y,x / x,f,y / y,f,x
    assert out.loc[0, "n_plans"] == 4
    assert isinstance(out.loc[0, "best_order"], str)
