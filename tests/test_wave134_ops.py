"""Wave-134 ops: Hungarian assignment — permutation-enumeration
parity, greedy-suboptimality witness, assignment validity."""

import itertools

import numpy as np
import pandas as pd


def _pairs(mat, rows=None, cols=None):
    n, m = mat.shape
    rows = rows or [f"r{i}" for i in range(n)]
    cols = cols or [f"c{j}" for j in range(m)]
    recs = [
        {"r": rows[i], "c": cols[j], "s": int(mat[i, j])}
        for i in range(n)
        for j in range(m)
    ]
    return pd.DataFrame(recs)


def _brute_max(mat):
    n = mat.shape[0]
    return max(
        sum(int(mat[i, p[i]]) for i in range(n))
        for p in itertools.permutations(range(n))
    )


def test_assignment_classic_greedy_trap():
    from ocr_service_ray.ops.assignment import optimal_assignment

    # greedy takes (0,0)=10 then is stuck with 1; optimal = 9+9
    mat = np.array([[10, 9], [9, 1]])
    out = optimal_assignment(_pairs(mat), "r", "c", "s")
    assert out["optimal_total"] == 18
    assert out["greedy_total"] == 11
    got = {(r, c) for r, c, _ in out["assignment"]}
    assert got == {("r0", "c1"), ("r1", "c0")}


def test_assignment_random_vs_enumeration():
    from ocr_service_ray.ops.assignment import optimal_assignment

    rng = np.random.RandomState(134)
    for n in (3, 4, 5, 6):
        mat = rng.randint(0, 100, (n, n))
        out = optimal_assignment(_pairs(mat), "r", "c", "s")
        assert out["optimal_total"] == _brute_max(mat)
        assert out["greedy_total"] <= out["optimal_total"]
        # returned assignment is a permutation realizing the value
        rs = [r for r, _, _ in out["assignment"]]
        cs = [c for _, c, _ in out["assignment"]]
        assert len(set(rs)) == n and len(set(cs)) == n
        assert sum(s for _, _, s in out["assignment"]) == out["optimal_total"]


def test_assignment_missing_pairs_score_zero():
    from ocr_service_ray.ops.assignment import optimal_assignment

    pairs = pd.DataFrame(
        {"r": ["a", "b"], "c": ["x", "y"], "s": [5, 7]}
    )  # a-y and b-x absent -> 0
    out = optimal_assignment(pairs, "r", "c", "s")
    assert out["optimal_total"] == 12


def test_assignment_rejects_unequal_sides():
    import pytest

    from ocr_service_ray.ops.assignment import optimal_assignment

    pairs = pd.DataFrame({"r": ["a", "b"], "c": ["x", "x"], "s": [1, 2]})
    with pytest.raises(ValueError, match="equal cardinality"):
        optimal_assignment(pairs, "r", "c", "s")
