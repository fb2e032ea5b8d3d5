"""Wave-173 ops: optimal BST — CLRS worked example, brute
enumeration parity, balanced-tree reference, degenerate sizes."""

import itertools

import numpy as np
import pandas as pd

from ocr_service_ray.ops.obst import obst_cost, obst_report


def _brute_opt(w):
    """Enumerate all BSTs over indices via memoized recursion on
    intervals (exponential but tiny n)."""
    from functools import lru_cache

    @lru_cache(None)
    def go(i, j, depth):
        if i >= j:
            return 0
        return min(
            w[r] * depth + go(i, r, depth + 1) + go(r + 1, j, depth + 1)
            for r in range(i, j)
        )

    return go(0, len(w), 1)


def test_clrs_style_example():
    # frequencies where the skewed tree beats balanced
    w = [40, 1, 1, 1, 50]
    opt, root, bal = obst_cost(w)
    assert opt == _brute_opt(tuple(w))
    assert opt < bal


def test_uniform_weights_balanced_is_optimal():
    w = [10] * 7
    opt, root, bal = obst_cost(w)
    assert opt == bal  # complete tree of 7 is optimal and unique-cost
    assert root == 3


def test_random_vs_brute():
    rng = np.random.RandomState(173)
    for _ in range(25):
        n = int(rng.randint(1, 9))
        w = [int(x) for x in rng.randint(0, 50, n)]
        opt, _, bal = obst_cost(w)
        assert opt == _brute_opt(tuple(w))
        assert opt <= bal


def test_empty_and_single():
    assert obst_cost([]) == (0, -1, 0)
    assert obst_cost([7]) == (7, 0, 7)


def test_report_selection_rule():
    freqs = pd.DataFrame(
        {"tok": ["b", "a", "c", "d"], "w": [5, 5, 9, 1]}
    )
    out = obst_report(freqs, "tok", "w", top_n=3)
    # top-3 by (w desc, tok asc): c(9), a(5), b(5) -> key-sorted a,b,c
    assert out.loc[0, "n_keys"] == 3
    assert out.loc[0, "total_weight"] == 19
