"""Wave-193 ops: exact runs distribution — full-distribution
identity, brute enumeration parity, degenerate cases."""

import itertools

from math import comb

from ocr_service_ray.ops.runsexact import _n_runs, runs_exact


def test_distribution_sums_to_total():
    # sum of N(r) over r = 2..n equals C(n, n1) — the partition
    # identity behind the test
    n1, n2 = 5, 4
    total = 0
    for r in range(2, n1 + n2 + 1):
        if r % 2 == 0:
            k = r // 2
            total += 2 * comb(n1 - 1, k - 1) * comb(n2 - 1, k - 1)
        else:
            k = (r - 1) // 2
            total += comb(n1 - 1, k - 1) * comb(n2 - 1, k) + comb(
                n1 - 1, k
            ) * comb(n2 - 1, k - 1)
    assert total == comb(n1 + n2, n1)


def test_brute_enumeration_parity():
    # enumerate all arrangements of 4 pluses / 3 minuses and verify
    # the tail count
    n1, n2 = 4, 3
    seqs = set(itertools.permutations([1] * n1 + [-1] * n2))
    for r_obs in range(2, n1 + n2 + 1):
        brute = sum(1 for s in seqs if _n_runs(list(s)) <= r_obs)
        # deltas realizing a given sign sequence
        deltas = None
        for s in seqs:
            if _n_runs(list(s)) == r_obs:
                deltas = list(s)
                break
        if deltas is None:
            continue
        out = runs_exact(deltas).iloc[0]
        assert out["p_num"] == brute
        assert out["p_den"] == comb(n1 + n2, n1)


def test_perfect_alternation_max_runs():
    deltas = [1, -1, 1, -1, 1, -1]
    out = runs_exact(deltas).iloc[0]
    assert out["r_obs"] == 6
    assert out["p_num"] == out["p_den"]  # max runs: whole tail


def test_full_clustering_min_runs():
    out = runs_exact([1, 1, 1, -1, -1, -1]).iloc[0]
    assert out["r_obs"] == 2
    assert out["p_num"] == 2  # the two fully-clustered arrangements


def test_degenerate_one_sided():
    out = runs_exact([1, 1, 1]).iloc[0]
    assert out["p_num"] == out["p_den"] == 1
    out = runs_exact([]).iloc[0]
    assert out["p_num"] == out["p_den"] == 1
