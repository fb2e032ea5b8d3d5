"""Wave-185 ops: exact Wilcoxon signed-rank — distribution closed
forms, brute enumeration parity, sign-test consistency."""

import itertools

import numpy as np

from ocr_service_ray.ops.wilcoxon import wilcoxon_exact


def _brute_p(deltas):
    """Enumerate all sign assignments of the observed ranks."""
    nz = sorted((abs(d), i, d > 0) for i, d in enumerate(deltas) if d != 0)
    n = len(nz)
    w_plus = sum(r for r, (_, _, pos) in enumerate(nz, 1) if pos)
    w_max = n * (n + 1) // 2
    k = min(w_plus, w_max - w_plus)
    count = 0
    for signs in itertools.product((0, 1), repeat=n):
        w = sum(r for r, s in zip(range(1, n + 1), signs) if s)
        if w <= k:
            count += 1
    return w_plus, min(2 * count, 2**n), 2**n


def test_all_same_direction_extreme():
    out = wilcoxon_exact([5, 3, 8, 1]).iloc[0]
    assert out["w_plus"] == 10  # every rank positive
    assert out["p_num"] == 2  # only W=0 is as extreme; 2 * count(0)
    assert out["p_den"] == 16


def test_random_vs_brute():
    rng = np.random.RandomState(185)
    for _ in range(20):
        n = int(rng.randint(0, 10))
        deltas = [int(x) for x in rng.randint(-50, 50, n)]
        out = wilcoxon_exact(deltas).iloc[0]
        wp, pn, pd_ = _brute_p(deltas)
        assert out["w_plus"] == wp
        assert out["p_num"] == pn
        assert out["p_den"] == pd_


def test_balanced_is_p_one_when_symmetric():
    # W+ = w_max/2 exactly -> k covers half the distribution; p
    # capped at 1
    out = wilcoxon_exact([1, -2, 3, -4]).iloc[0]
    # ranks 1..4; positives rank 1,3 -> W+ = 4; w_max = 10, k = 4
    assert out["w_plus"] == 4
    assert out["p_num"] <= out["p_den"]


def test_zero_deltas_dropped():
    out = wilcoxon_exact([0, 0, 7]).iloc[0]
    assert out["n"] == 1 and out["w_plus"] == 1
    assert out["p_num"] == out["p_den"]  # n=1: 2*count(W=0)=2 = 2^1
