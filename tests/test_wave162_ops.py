"""Wave-162 ops: monotonic-deque sliding extrema — brute window
parity, amortized-correctness edge cases."""

import numpy as np

from ocr_service_ray.ops.slidemax import _window_extrema


def _brute(vals, k):
    n = len(vals)
    mx = [max(vals[max(0, i - k + 1) : i + 1]) for i in range(n)]
    mn = [min(vals[max(0, i - k + 1) : i + 1]) for i in range(n)]
    return mx, mn


def test_hand_worked():
    vals = np.array([3, 1, 4, 1, 5, 9, 2, 6], np.int64)
    mx, mn = _window_extrema(vals, 3)
    assert list(mx) == [3, 3, 4, 4, 5, 9, 9, 9]
    assert list(mn) == [3, 1, 1, 1, 1, 1, 2, 2]


def test_monotone_sequences():
    up = np.arange(10, dtype=np.int64)
    mx, mn = _window_extrema(up, 4)
    assert list(mx) == list(up)  # each new element is the max
    assert list(mn) == [max(0, i - 3) for i in range(10)]
    down = up[::-1].copy()
    mx, mn = _window_extrema(down, 4)
    assert list(mn) == list(down)


def test_k1_and_k_huge():
    vals = np.array([5, 2, 8, 2], np.int64)
    mx, mn = _window_extrema(vals, 1)
    assert list(mx) == list(vals) and list(mn) == list(vals)
    mx, mn = _window_extrema(vals, 100)
    assert list(mx) == [5, 5, 8, 8]
    assert list(mn) == [5, 2, 2, 2]


def test_random_vs_brute():
    rng = np.random.RandomState(162)
    for _ in range(40):
        n = int(rng.randint(1, 200))
        k = int(rng.randint(1, 12))
        vals = rng.randint(-50, 50, n).astype(np.int64)
        mx, mn = _window_extrema(vals, k)
        bmx, bmn = _brute(list(vals), k)
        assert list(mx) == bmx
        assert list(mn) == bmn
