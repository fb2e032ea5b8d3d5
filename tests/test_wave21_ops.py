"""Wave-21 ops: Cramér's V² and lead-lag cross-correlation — vs
brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(days):
    base = np.datetime64("2024-03-01", "us")
    return [base + np.timedelta64(int(d) * 86_400_000_000, "us") for d in days]


def test_cramers_v2_extremes():
    from ocr_service_ray.ops.divergence import cramers_v2

    # perfect association: lang determines source
    perf = cramers_v2(
        _ds({"l": ["a", "a", "b", "b"], "s": ["x", "x", "y", "y"]}), "l", "s"
    )
    assert perf["v2_ppm"].iloc[0] == 1_000_000
    assert perf["r_cats"].iloc[0] == 2
    # independence: every cell equal
    ind = cramers_v2(
        _ds({"l": ["a", "a", "b", "b"], "s": ["x", "y", "x", "y"]}), "l", "s"
    )
    assert ind["v2_ppm"].iloc[0] == 0
    # degenerate single column category
    deg = cramers_v2(_ds({"l": ["a", "b"], "s": ["x", "x"]}), "l", "s")
    assert deg["v2_ppm"].iloc[0] == 0


def test_leadlag_corr_shifted_series():
    from ocr_service_ray.ops.trend import leadlag_corr

    # b is a shifted-by-2 copy of a -> lag-2 correlation is perfect;
    # series chosen aperiodic so other lags stay below 1e6
    a_counts = {0: 5, 1: 1, 2: 3, 3: 1, 4: 7, 5: 1, 6: 2}
    days_a = [d for d, c in a_counts.items() for _ in range(c)]
    days_b = [d + 2 for d in days_a]
    out = leadlag_corr(
        _ds(
            {
                "k": ["a"] * len(days_a) + ["b"] * len(days_b),
                "ts": _ts(days_a + days_b),
            }
        ),
        "k",
        "a",
        "b",
        max_lag=3,
    ).set_index("lag")
    assert out.loc[2, "xcorr2_ppm"] == 1_000_000
    for lag in (0, 1, 3):
        assert abs(out.loc[lag, "xcorr2_ppm"]) < 1_000_000
    # n_pairs shrinks with lag over the 9-day grid
    assert out.loc[0, "n_pairs"] == 9
    assert out.loc[3, "n_pairs"] == 6
