"""Wave-191 ops: Simpson diversity + Chao1 — closed forms,
estimator semantics, Fraction parity."""

from fractions import Fraction

import pandas as pd

from ocr_service_ray.ops.diversity import diversity_report


def _tc(groups):
    rows = []
    for g, counts in groups.items():
        for i, c in enumerate(counts):
            rows.append((g, f"t{i}", c))
    return pd.DataFrame(rows, columns=["source", "tok", "c"])


def test_all_same_token_zero_diversity():
    out = diversity_report(_tc({"a": [10]}), "source", "c").iloc[0]
    assert out["d_num"] == 0  # both draws always equal


def test_all_distinct_full_diversity():
    out = diversity_report(_tc({"a": [1, 1, 1, 1]}), "source", "c").iloc[0]
    assert out["d_num"] == out["d_den"]  # D = 1 exactly
    # Chao1 with f1=4, f2=0: 4 + 4*3/2 = 10 species estimated
    assert out["chao1_milli"] == 4000 + 1000 * 4 * 3 // 2


def test_simpson_fraction_parity():
    counts = [5, 3, 2]
    out = diversity_report(_tc({"a": counts}), "source", "c").iloc[0]
    N = sum(counts)
    expect = 1 - Fraction(
        sum(c * (c - 1) for c in counts), N * (N - 1)
    )
    assert Fraction(int(out["d_num"]), int(out["d_den"])) == expect


def test_chao1_no_singletons_equals_observed():
    out = diversity_report(_tc({"a": [3, 4, 5]}), "source", "c").iloc[0]
    assert out["f1"] == 0
    assert out["chao1_milli"] == 3000  # S_obs, nothing unseen


def test_per_group_independence():
    out = diversity_report(
        _tc({"a": [1, 1], "b": [9]}), "source", "c"
    ).set_index("source")
    assert out.loc["a", "s_obs"] == 2 and out.loc["b", "s_obs"] == 1
    assert out.loc["b", "d_num"] == 0
