"""Wave-117 ops: DTW — hand-checked alignments, metric sanity,
brute-force recursion parity, layout invariance."""

import functools

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute(a, b):
    """Exponential reference: direct memoized recursion."""

    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0 and j == 0:
            return 0
        if i == 0 or j == 0:
            return 1 << 60
        return abs(a[i - 1] - b[j - 1]) + min(
            d(i - 1, j - 1), d(i - 1, j), d(i, j - 1)
        )

    return d(len(a), len(b))


def test_dtw_hand_checked():
    from ocr_service_ray.ops.dtw import dtw_cost

    # identical series align perfectly
    assert dtw_cost(np.array([1, 2, 3]), np.array([1, 2, 3])) == 0
    # time-shifted step: DTW absorbs the shift where L1 would not
    assert dtw_cost(np.array([0, 0, 5, 5]), np.array([0, 5, 5, 5])) == 0
    # classic small case
    assert dtw_cost(np.array([1, 3, 4]), np.array([1, 4])) == 1


def test_dtw_matches_brute_force():
    from ocr_service_ray.ops.dtw import dtw_cost

    rng = np.random.RandomState(117)
    for _ in range(20):
        a = rng.randint(0, 20, rng.randint(1, 8)).astype(np.int64)
        b = rng.randint(0, 20, rng.randint(1, 8)).astype(np.int64)
        assert dtw_cost(a, b) == _brute(tuple(a.tolist()), tuple(b.tolist()))


def test_dtw_symmetry_and_bounds():
    from ocr_service_ray.ops.dtw import dtw_cost

    rng = np.random.RandomState(3)
    a = rng.randint(0, 50, 12).astype(np.int64)
    b = rng.randint(0, 50, 12).astype(np.int64)
    assert dtw_cost(a, b) == dtw_cost(b, a)
    # DTW <= L1 on equal-length series (diagonal path is one warping)
    assert dtw_cost(a, b) <= int(np.abs(a - b).sum())


def test_grouped_series_dtw_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.dtw import grouped_series_dtw

    rng = np.random.RandomState(11)
    n = 200
    tab = {
        "k": [f"t{i % 3}" for i in range(n)],
        "p": rng.randint(0, 15, n).tolist(),
    }
    base = grouped_series_dtw(rd.from_arrow(pa.table(tab)), "k", "p")
    perm = rng.permutation(n)
    shuf = {c: [tab[c][i] for i in perm] for c in tab}
    out = grouped_series_dtw(
        rd.from_arrow(pa.table(shuf)).repartition(6), "k", "p"
    )
    pd.testing.assert_frame_equal(base, out)
