"""Wave-194 ops: Kendall concordance census — pair accounting
identity, closed forms, brute parity, chunking invariance."""

import numpy as np

from ocr_service_ray.ops.kendallpairs import kendall_census


def _brute(x, y):
    n = len(x)
    C = D = TX = TY = TB = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = int(x[j] > x[i]) - int(x[j] < x[i])
            sy = int(y[j] > y[i]) - int(y[j] < y[i])
            if sx * sy == 1:
                C += 1
            elif sx * sy == -1:
                D += 1
            elif sx == 0 and sy == 0:
                TB += 1
            elif sx == 0:
                TX += 1
            else:
                TY += 1
    return C, D, TX, TY, TB


def test_perfect_agreement():
    out = kendall_census(np.arange(6), np.arange(6) * 10).iloc[0]
    assert out["concordant"] == 15 and out["discordant"] == 0
    assert out["tau_a_num"] == out["tau_a_den"] == 15


def test_perfect_reversal():
    out = kendall_census(np.arange(6), -np.arange(6)).iloc[0]
    assert out["discordant"] == 15
    assert out["tau_a_num"] == -15


def test_pair_classes_partition():
    rng = np.random.RandomState(194)
    x = rng.randint(0, 5, 40)
    y = rng.randint(0, 5, 40)
    out = kendall_census(x, y).iloc[0]
    total = (
        out["concordant"] + out["discordant"] + out["ties_x"]
        + out["ties_y"] + out["ties_both"]
    )
    assert total == 40 * 39 // 2


def test_random_vs_brute_and_chunking():
    rng = np.random.RandomState(49)
    for _ in range(8):
        n = int(rng.randint(2, 120))
        x = rng.randint(-9, 9, n)
        y = rng.randint(-9, 9, n)
        a = kendall_census(x, y, chunk=7).iloc[0]
        b = kendall_census(x, y, chunk=1000).iloc[0]
        C, D, TX, TY, TB = _brute(list(x), list(y))
        for row in (a, b):
            assert row["concordant"] == C
            assert row["discordant"] == D
            assert row["ties_x"] == TX
            assert row["ties_y"] == TY
            assert row["ties_both"] == TB
