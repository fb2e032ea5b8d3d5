"""Wave-189 ops: Hoover index — closed forms, bounds, transfer
semantics."""

from fractions import Fraction

import numpy as np

from ocr_service_ray.ops.hoover import hoover_index


def test_perfect_equality_zero():
    out = hoover_index([7, 7, 7, 7]).iloc[0]
    assert out["h_num"] == 0 and out["hoover_ppm"] == 0


def test_total_concentration():
    # one user holds everything: H = (n-1)/n
    out = hoover_index([12, 0, 0, 0]).iloc[0]
    assert Fraction(int(out["h_num"]), int(out["h_den"])) == Fraction(3, 4)
    assert out["hoover_ppm"] == 750_000


def test_transfer_interpretation():
    # [3, 1]: move 1 unit -> equal; H = 1/4 of total
    out = hoover_index([3, 1]).iloc[0]
    assert Fraction(int(out["h_num"]), int(out["h_den"])) == Fraction(1, 4)


def test_bounds_and_scale_invariance():
    rng = np.random.RandomState(189)
    for _ in range(20):
        vals = [int(x) for x in rng.randint(0, 100, rng.randint(1, 30))]
        if sum(vals) == 0:
            continue
        out = hoover_index(vals).iloc[0]
        h = Fraction(int(out["h_num"]), int(out["h_den"]))
        assert 0 <= h < 1
        out2 = hoover_index([v * 7 for v in vals]).iloc[0]
        assert Fraction(int(out2["h_num"]), int(out2["h_den"])) == h


def test_empty():
    out = hoover_index([]).iloc[0]
    assert list(out) == [0, 0, 0, 0, 0]
