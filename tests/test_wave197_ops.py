"""Wave-197 ops: post-dominance via reversed/negated reuse of the
dominance engine — closed forms and duality."""

import pandas as pd

from ocr_service_ray.ops.dominators import dominance_relation


def _postdom(pairs):
    rev = pd.DataFrame(
        {"src": [-b for _, b in pairs], "dst": [-a for a, _ in pairs]}
    )
    out = dominance_relation(rev)
    out["node"] = -out["node"]
    out["dom"] = -out["dom"]
    return set(zip(out["node"], out["dom"]))


def test_chain_postdominators():
    # 0 -> 1 -> 2 -> 3 (exit 3): every later node postdominates
    # every earlier one
    got = _postdom([(0, 1), (1, 2), (2, 3)])
    assert (0, 1) in got and (0, 2) in got and (0, 3) in got
    assert (2, 1) not in got


def test_diamond_join_postdominates_branches():
    # 0 -> 1 -> 3, 0 -> 2 -> 3: the join 3 postdominates everything;
    # branches postdominate nothing else
    got = _postdom([(0, 1), (1, 3), (0, 2), (2, 3)])
    assert (0, 3) in got and (1, 3) in got and (2, 3) in got
    assert (0, 1) not in got and (0, 2) not in got


def test_loop_exit_postdominates_loop():
    # 0 -> 1 -> 2 -> 1, 2 -> 9 (exit 9 = largest, per contract):
    # 9 postdominates everything; 2 postdominates 1 and 0 (the only
    # way forward), 1 postdominates 0
    got = _postdom([(0, 1), (1, 2), (2, 1), (2, 9)])
    assert (0, 9) in got and (1, 9) in got and (2, 9) in got
    assert (0, 2) in got and (1, 2) in got
    assert (0, 1) in got
    assert (1, 0) not in got


def test_node_not_reaching_exit_excluded():
    # 5 cannot reach the exit 9: excluded from the relation
    got = _postdom([(0, 9), (0, 5)])
    assert all(n != 5 for n, _ in got)
