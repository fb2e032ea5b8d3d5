"""Wave-182 ops: Cramér-von Mises — identical/disjoint closed
forms, Fraction reference parity, shift sensitivity."""

from fractions import Fraction

import numpy as np
import pandas as pd

from ocr_service_ray.ops.cvm import cvm_micro


def _table(vals1, vals2):
    from collections import Counter

    c1, c2 = Counter(vals1), Counter(vals2)
    xs = sorted(set(c1) | set(c2))
    return pd.DataFrame(
        {"v": xs, "a": [c1.get(x, 0) for x in xs], "b": [c2.get(x, 0) for x in xs]}
    )


def _ref(vals1, vals2):
    n, m = len(vals1), len(vals2)
    xs = sorted(set(vals1) | set(vals2))
    from collections import Counter

    c1, c2 = Counter(vals1), Counter(vals2)
    F1 = F2 = Fraction(0)
    acc = Fraction(0)
    for x in xs:
        F1 += Fraction(c1.get(x, 0), n)
        F2 += Fraction(c2.get(x, 0), m)
        acc += (F1 - F2) ** 2 * Fraction(c1.get(x, 0) + c2.get(x, 0), n + m)
    t = Fraction(n * m, (n + m)) / (n + m) * acc
    return t


def test_identical_distributions_zero():
    v = [1, 2, 2, 3, 5]
    n, m, micro = cvm_micro(_table(v, v), "v", "a", "b")
    assert micro == 0


def test_disjoint_supports_large():
    a = [1, 2, 3]
    b = [100, 101, 102]
    n, m, micro = cvm_micro(_table(a, b), "v", "a", "b")
    ref = _ref(a, b)
    assert micro == int(ref * 10**6)  # floor of the exact rational
    assert micro > 50_000  # strongly separated (max T ~ 1/6 for n=m)


def test_matches_fraction_reference():
    rng = np.random.RandomState(182)
    for _ in range(25):
        a = [int(x) for x in rng.randint(0, 12, rng.randint(1, 40))]
        b = [int(x) for x in rng.randint(0, 12, rng.randint(1, 40))]
        n, m, micro = cvm_micro(_table(a, b), "v", "a", "b")
        assert micro == (_ref(a, b) * 10**6).__floor__()


def test_shift_sensitivity_monotone():
    base = list(range(20))
    prev = -1
    for shift in (0, 2, 5, 10):
        shifted = [x + shift for x in base]
        _, _, micro = cvm_micro(_table(base, shifted), "v", "a", "b")
        assert micro >= prev
        prev = micro
