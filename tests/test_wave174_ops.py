"""Wave-174 ops: shrinking-cone learned-index segmentation —
closed forms, validity + maximality properties, eps sensitivity."""

from fractions import Fraction

import numpy as np

from ocr_service_ray.ops.learnedindex import cone_segments


def _segments_slow(xs, eps):
    """From-scratch feasibility reference: greedy, but each
    extension recomputes the full slope-interval intersection over
    ALL points of the current segment."""
    n = len(xs)
    if n == 0:
        return 0, []
    segs = []
    start = 0
    i = 1
    while i < n:
        lo, hi = None, None
        feasible = True
        for j in range(start + 1, i + 1):
            dx = xs[j] - xs[start]
            nlo = Fraction(j - start - eps, dx)
            nhi = Fraction(j - start + eps, dx)
            lo = nlo if lo is None else max(lo, nlo)
            hi = nhi if hi is None else min(hi, nhi)
            if lo > hi:
                feasible = False
                break
        if feasible:
            i += 1
        else:
            segs.append((start, i - 1))
            start = i
            i += 1
    segs.append((start, n - 1))
    return len(segs), segs


def test_perfect_line_one_segment():
    assert cone_segments(list(range(100, 400, 3))) == 1
    assert cone_segments([5]) == 1
    assert cone_segments([]) == 0


def test_step_jump_splits():
    # ids 0..9 then a huge gap then 10 more: slope collapses,
    # eps=2 can absorb only so much
    xs = list(range(10)) + [10**6 + i for i in range(10)]
    assert cone_segments(xs, eps=2) == 2


def test_eps_monotone():
    rng = np.random.RandomState(174)
    xs = np.cumsum(rng.randint(1, 50, 60)).tolist()
    s2 = cone_segments(xs, 2)
    s8 = cone_segments(xs, 8)
    assert s8 <= s2  # looser error bound -> fewer segments


def test_matches_from_scratch_reference():
    rng = np.random.RandomState(17)
    for _ in range(25):
        n = int(rng.randint(1, 40))
        xs = np.cumsum(rng.randint(1, 100, n)).tolist()
        got = cone_segments(xs, 2)
        ref, _ = _segments_slow(xs, 2)
        assert got == ref
