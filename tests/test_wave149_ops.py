"""Wave-149 ops: exact 0/1 knapsack — brute enumeration parity,
greedy-trap closed form, backtrack determinism."""

import itertools

import numpy as np
import pandas as pd

from ocr_service_ray.ops.knapsack import knapsack_select


def _df(ids, w, v):
    return pd.DataFrame({"doc_id": ids, "w": w, "v": v})


def _brute_best(w, v, B):
    best = 0
    for bits in itertools.product((0, 1), repeat=len(w)):
        tw = sum(b * x for b, x in zip(bits, w))
        if tw <= B:
            best = max(best, sum(b * x for b, x in zip(bits, v)))
    return best


def test_greedy_trap():
    # greedy-by-ratio takes the 6-weight item (ratio 5) and stops;
    # optimal takes the two 5-weight items (total 48 > 30)
    out = knapsack_select(
        _df([1, 2, 3], [6, 5, 5], [30, 24, 24]), "doc_id", "w", "v", 10
    )
    assert out["best_value"].iloc[0] == 48
    assert list(out["selected"]) == [0, 1, 1]


def test_budget_zero_and_overweight():
    out = knapsack_select(_df([1, 2], [5, 300], [9, 9]), "doc_id", "w", "v", 4)
    assert out["best_value"].iloc[0] == 0
    assert list(out["selected"]) == [0, 0]


def test_tie_prefers_not_selecting():
    # two identical items, budget fits one: dp ties mean the
    # backtrack keeps the LATER item only if it changed dp — with
    # equal values dp_2 == dp_1 at B, so item 2 is skipped and
    # item 1 selected
    out = knapsack_select(_df([1, 2], [4, 4], [7, 7]), "doc_id", "w", "v", 5)
    assert out["best_value"].iloc[0] == 7
    assert list(out["selected"]) == [1, 0]


def test_random_vs_brute():
    rng = np.random.RandomState(149)
    for _ in range(25):
        n = int(rng.randint(1, 11))
        w = [int(x) for x in rng.randint(1, 15, n)]
        v = [int(x) for x in rng.randint(0, 40, n)]
        B = int(rng.randint(0, 40))
        out = knapsack_select(
            _df(list(range(n)), w, v), "doc_id", "w", "v", B
        )
        assert out["best_value"].iloc[0] == _brute_best(w, v, B)
        # the reported selection is feasible and achieves best_value
        tw = int((out["weight"] * out["selected"]).sum())
        tv = int((out["value"] * out["selected"]).sum())
        assert tw <= B and tv == out["best_value"].iloc[0]
