"""Wave-196 ops: natural loops — textbook CFG closed forms, nested
and shared-header loops, brute parity."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.natloops import natural_loops


def _df(pairs):
    return pd.DataFrame(
        {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}
    )


def test_simple_while_loop():
    # 0 -> 1 -> 2 -> 1: back edge 2->1, loop {1, 2}
    out = natural_loops(_df([(0, 1), (1, 2), (2, 1)]))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["header"] == 1 and r["n_back_edges"] == 1
    assert r["body_size"] == 2


def test_no_loops_in_dag():
    out = natural_loops(_df([(0, 1), (0, 2), (1, 3), (2, 3)]))
    assert len(out) == 0


def test_nested_loops():
    # outer: 3->1; inner: 2->2? no self loops — inner 0->1->2->1,
    # outer ...->3->1? Build: 0->1, 1->2, 2->1 (inner), 2->3, 3->1
    # (outer shares header 1): merged body under header 1
    out = natural_loops(_df([(0, 1), (1, 2), (2, 1), (2, 3), (3, 1)]))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["header"] == 1
    assert r["n_back_edges"] == 2
    assert r["body_size"] == 3  # {1, 2, 3}


def test_two_separate_loops():
    out = natural_loops(
        _df([(0, 1), (1, 2), (2, 1), (2, 3), (3, 4), (4, 3)])
    )
    got = out.set_index("header")
    assert got.loc[1, "body_size"] == 2
    assert got.loc[3, "body_size"] == 2


def test_non_dominating_cycle_edge_is_not_back_edge():
    # cycle 1 -> 2 -> 1 reachable two ways from 0: 0->1 and 0->2.
    # Neither 1 nor 2 dominates the other -> NO natural loop
    out = natural_loops(_df([(0, 1), (0, 2), (1, 2), (2, 1)]))
    assert len(out) == 0
