"""Wave-171 ops: Golomb-Rice selection — hand-worked bit counts,
optimality structure, k-sensitivity."""

import numpy as np

from ocr_service_ray.ops.rice import rice_bits, rice_table


def test_hand_worked_bits():
    # gap 1 encodes value 0: k=0 -> 1 bit; k=2 -> 3 bits
    assert rice_bits(np.array([1]), 0) == 1
    assert rice_bits(np.array([1]), 2) == 3
    # gap 9 -> value 8: k=0 -> 9 bits; k=3 -> 1+1+3 = 5 bits
    assert rice_bits(np.array([9]), 0) == 9
    assert rice_bits(np.array([9]), 3) == 5


def test_small_gaps_prefer_small_k():
    t = rice_table(np.ones(100, dtype=np.int64))
    assert t[t["is_best"] == 1]["k"].iloc[0] == 0
    assert t[t["k"] == 0]["total_bits"].iloc[0] == 100


def test_large_uniform_gaps_prefer_larger_k():
    t = rice_table(np.full(50, 1000, dtype=np.int64))
    best = t[t["is_best"] == 1]["k"].iloc[0]
    assert 6 <= best <= 12
    # best really is argmin
    assert (
        t[t["k"] == best]["total_bits"].iloc[0] == t["total_bits"].min()
    )


def test_monotone_tail():
    # beyond the optimum, bits grow by n per k (remainder dominates)
    gaps = np.full(10, 4, dtype=np.int64)
    t = rice_table(gaps)
    tb = t.set_index("k")["total_bits"]
    for k in range(8, 15):
        assert tb[k + 1] == tb[k] + 10


def test_empty_stream():
    t = rice_table(np.array([], dtype=np.int64))
    assert (t["total_bits"] == 0).all()
    assert t[t["is_best"] == 1]["k"].iloc[0] == 0
