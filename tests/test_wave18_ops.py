"""Wave-18 ops: Fano burstiness, top-decile share, weighted
quantiles, consecutive gaps — vs brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(days):
    base = np.datetime64("2024-03-01", "us")
    return [base + np.timedelta64(int(d) * 86_400_000_000, "us") for d in days]


def test_fano_grid_poisson_like_and_bursty():
    from ocr_service_ray.ops.trend import fano_grid

    # constant 2/day over 4 days -> var 0 -> fano 0
    # bursty: [8, 0, 0, 0] -> mean 2, var_pop 12 -> fano 6e6
    days = [0, 0, 1, 1, 2, 2, 3, 3] + [0] * 8
    keys = ["flat"] * 8 + ["burst"] * 8
    out = fano_grid(_ds({"k": keys, "ts": _ts(days)}), "k").set_index("k")
    assert out.loc["flat", "fano_ppm"] == 0
    assert out.loc["flat", "n_days"] == 4
    assert out.loc["burst", "fano_ppm"] == 6_000_000
    assert out.loc["burst", "n_rows"] == 8


def test_top_share_by_group_brute_force():
    from ocr_service_ray.ops.divergence import top_share_by_group

    rng = np.random.RandomState(6)
    g = rng.choice(["a", "b"], 500).tolist()
    m = rng.zipf(1.7, 500).astype(np.int64)
    m = np.minimum(m, 50).tolist()
    out = (
        top_share_by_group(_ds({"g": g, "m": m}), "g", "m", top_pct=10)
        .to_pandas()
        .set_index("g")
    )
    df = pd.DataFrame({"g": g, "m": m})
    for key, sub in df.groupby("g"):
        c = sorted(sub.groupby("m").size().tolist(), reverse=True)
        k = (len(c) * 10 + 99) // 100
        expect = (1_000_000 * sum(c[:k])) // sum(c)
        assert out.loc[key, "top_share_ppm"] == expect
        assert out.loc[key, "n_members"] == len(c)
    # single member owns everything
    solo = (
        top_share_by_group(_ds({"g": ["s"] * 5, "m": [1] * 5}), "g", "m")
        .to_pandas()
    )
    assert solo["top_share_ppm"].iloc[0] == 1_000_000


def test_grouped_weighted_quantiles_expanded_equivalence():
    from ocr_service_ray.ops.sketch import grouped_weighted_quantiles

    rng = np.random.RandomState(10)
    vals = rng.randint(0, 30, 200)
    ws = rng.randint(1, 6, 200)
    keys = rng.choice(["x", "y"], 200)
    out = (
        grouped_weighted_quantiles(
            _ds({"g": keys.tolist(), "v": vals.tolist(), "w": ws.tolist()}),
            ["g"],
            "v",
            "w",
        )
        .to_pandas()
        .set_index(["g", "q_pct"])
    )
    # reference: quantile_disc over the weight-expanded multiset
    import math

    for key in ("x", "y"):
        sel = keys == key
        expanded = np.sort(np.repeat(vals[sel], ws[sel]))
        n = len(expanded)
        for num, den, pct in ((1, 4, 25), (1, 2, 50), (3, 4, 75)):
            idx = max(math.ceil(num / den * n) - 1, 0)
            assert out.loc[(key, pct), "value"] == expanded[idx], (key, pct)


def test_consecutive_gaps_multiset():
    from ocr_service_ray.ops.retention import consecutive_gaps

    # u1 days [0, 3, 3, 10] -> gaps {3, 0, 7}; u2 single event -> none
    days = [0, 3, 3, 10, 5]
    users = [1, 1, 1, 1, 2]
    out = (
        consecutive_gaps(_ds({"k": users, "ts": _ts(days)}), "k")
        .to_pandas()
        .sort_values("gap")
    )
    assert out["k"].tolist() == [1, 1, 1]
    assert out["gap"].tolist() == [0, 3, 7]
