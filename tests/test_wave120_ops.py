"""Wave-120 ops: L1 k-segmentation — brute-force optimality,
changepoint recovery, invariants."""

import itertools

import numpy as np
import pandas as pd


def _run(v, k):
    from ocr_service_ray.ops.segment import l1_k_segmentation

    return l1_k_segmentation(pd.DataFrame({"v": v}), "v", k)


def _brute_total(v, k):
    """Enumerate all k-segmentations, return min total L1 cost."""
    n = len(v)

    def seg_cost(w):
        w = sorted(w)
        med = w[(len(w) + 1) // 2 - 1]
        return sum(abs(x - med) for x in w)

    best = None
    for cuts in itertools.combinations(range(1, n), k - 1):
        bounds = [0, *cuts, n]
        tot = sum(
            seg_cost(v[bounds[t] : bounds[t + 1]]) for t in range(k)
        )
        if best is None or tot < best:
            best = tot
    return best


def test_segmentation_recovers_clean_changepoints():
    # three flat levels + one noisy level: exact recovery, zero cost
    v = [5] * 6 + [50] * 5 + [20] * 7 + [90] * 4
    out = _run(v, 4)
    assert out["total_cost"].iloc[0] == 0
    assert out["start_i"].tolist() == [1, 7, 12, 19]
    assert out["seg_med"].tolist() == [5, 50, 20, 90]


def test_segmentation_matches_brute_force():
    rng = np.random.RandomState(120)
    for n, k in [(10, 2), (12, 3), (14, 4)]:
        v = rng.randint(0, 100, n).astype(int).tolist()
        out = _run(v, k)
        assert out["total_cost"].iloc[0] == _brute_total(v, k)
        # structural invariants
        assert out["n_periods"].sum() == n
        assert out["start_i"].iloc[0] == 1
        assert out["end_i"].iloc[-1] == n
        starts = out["start_i"].tolist()
        ends = out["end_i"].tolist()
        assert all(s == e + 1 for s, e in zip(starts[1:], ends[:-1]))
        assert out["seg_cost"].sum() == out["total_cost"].iloc[0]


def test_segmentation_k_equals_n_is_free():
    v = [3, 17, 9, 40]
    out = _run(v, 4)
    assert out["total_cost"].iloc[0] == 0
    assert out["seg_med"].tolist() == v


def test_segmentation_requires_enough_periods():
    import pytest

    with pytest.raises(ValueError, match="need >= 4"):
        _run([1, 2, 3], 4)
