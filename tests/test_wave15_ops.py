"""Wave-15 ops: TV distance, HHI concentration, EWMA grid, lag-1
autocorrelation, full-outer reconciliation, day-over-day Jaccard —
vs brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(days):
    base = np.datetime64("2024-03-01", "us")
    return [base + np.timedelta64(int(d) * 86_400_000_000, "us") for d in days]


def test_tv_distance_matches_brute_force():
    from ocr_service_ray.ops.divergence import tv_distance_by_group

    rng = np.random.RandomState(3)
    g = rng.choice(["s1", "s2", "s3"], 300).tolist()
    v = rng.choice(["en", "ru", "de", "fr"], 300, p=[0.5, 0.3, 0.1, 0.1]).tolist()
    out = (
        tv_distance_by_group(_ds({"g": g, "v": v}), "g", "v")
        .set_index("g")
        .sort_index()
    )
    df = pd.DataFrame({"g": g, "v": v})
    total = len(df)
    glob = df["v"].value_counts()
    for key, sub in df.groupby("g"):
        ng = len(sub)
        num = 0
        for val in glob.index:
            cgv = int((sub["v"] == val).sum())
            num += abs(cgv * total - ng * int(glob[val]))
        assert out.loc[key, "tv_ppm"] == (1_000_000 * num) // (2 * ng * total)
        assert out.loc[key, "n_rows"] == ng
    # identical distribution -> tv 0
    same = tv_distance_by_group(
        _ds({"g": ["a"] * 4 + ["b"] * 4, "v": ["x", "y"] * 4}), "g", "v"
    )
    assert set(same["tv_ppm"]) == {0}


def test_grouped_hhi_uniform_and_single():
    from ocr_service_ray.ops.divergence import grouped_hhi

    # group u: 4 members x 5 rows each -> hhi = 1/4; group s: 1 member
    g = ["u"] * 20 + ["s"] * 7
    m = [i % 4 for i in range(20)] + [99] * 7
    out = (
        grouped_hhi(_ds({"g": g, "m": m}), "g", "m")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["u", "hhi_ppm"] == 250_000
    assert out.loc["u", "n_members"] == 4
    assert out.loc["s", "hhi_ppm"] == 1_000_000
    assert out.loc["s", "n_rows"] == 7


def test_ewma_grid_matches_reference_weights():
    from ocr_service_ray.ops.trend import ewma_grid

    days = [0, 0, 1, 3, 3, 3, 6]
    out = ewma_grid(
        _ds({"k": ["a"] * len(days), "ts": _ts(days)}), "k", "ts", window=8
    ).sort_values("day")
    n = {0: 2, 1: 1, 2: 0, 3: 3, 4: 0, 5: 0, 6: 1}
    base = int(out["day"].min())
    for _, row in out.iterrows():
        d = int(row["day"]) - base
        s = sum(n.get(d - j, 0) * (1 << (7 - j)) for j in range(8))
        assert row["ewma_milli"] == (1000 * s) // 255, d
        assert row["n"] == n[d]
    assert len(out) == 7  # dense: day 2, 4, 5 zero-filled


def test_lag1_autocorr_signs_and_dropout():
    from ocr_service_ray.ops.trend import lag1_autocorr

    # alternating series -> negative autocorr; constant -> dropped
    # const must span the GLOBAL grid (zero-fill happens over the
    # min..max across ALL keys — same contract as the SQL oracle)
    alt_days = [0, 0, 0, 1, 2, 2, 2, 3, 4, 4, 4, 5]
    const_days = [0, 1, 2, 3, 4, 5]
    out = lag1_autocorr(
        _ds(
            {
                "k": ["alt"] * len(alt_days) + ["const"] * len(const_days),
                "ts": _ts(alt_days + const_days),
            }
        ),
        "k",
        "ts",
    )
    assert set(out["k"]) == {"alt"}  # constant series drops (den == 0)
    row = out.iloc[0]
    # brute force on the dense alt series [3,1,3,1,3,1]
    xs, ys = [3, 1, 3, 1, 3], [1, 3, 1, 3, 1]
    npairs = len(xs)
    sx, sy = sum(xs), sum(ys)
    num = npairs * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    den = (npairs * sum(a * a for a in xs) - sx * sx) * (
        npairs * sum(b * b for b in ys) - sy * sy
    )
    expect = (1_000_000 * num * num) // den
    assert row["n_pairs"] == npairs
    assert row["acorr2_ppm"] == -expect  # sign of num (negative)
    # float sanity: |r| matches numpy corrcoef within rounding
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(abs(row["acorr2_ppm"]) / 1e6 - r * r) < 1e-5


def test_reconcile_keys_all_three_categories():
    from ocr_service_ray.ops.relational import reconcile_keys

    left = _ds({"lk": [1, 1, 2, 3, 3, 3]})
    right = _ds({"rk": [2, 2, 2, 4]})
    out = (
        reconcile_keys(left, right, "lk", "rk")
        .to_pandas()
        .set_index("category")
        .sort_index()
    )
    assert out.loc["both", "n_keys"] == 1  # key 2
    assert out.loc["both", "left_rows"] == 1
    assert out.loc["both", "right_rows"] == 3
    assert out.loc["left_only", "n_keys"] == 2  # keys 1, 3
    assert out.loc["left_only", "left_rows"] == 5
    assert out.loc["left_only", "right_rows"] == 0
    assert out.loc["right_only", "n_keys"] == 1  # key 4
    assert out.loc["right_only", "right_rows"] == 1


def test_day_over_day_jaccard_brute_force():
    from ocr_service_ray.ops.retention import day_over_day_jaccard

    rng = np.random.RandomState(11)
    days = rng.randint(0, 6, 120)
    users = rng.randint(0, 9, 120)
    out = (
        day_over_day_jaccard(_ds({"user_id": users, "ts": _ts(days)}))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    sets = {d: set(users[days == d].tolist()) for d in range(6)}
    base = int(out["day"].min())
    assert len(out) == 6  # max_day+1 artifact dropped
    for _, row in out.iterrows():
        d = int(row["day"]) - base
        cur, prev = sets.get(d, set()), sets.get(d - 1, set())
        inter = len(cur & prev)
        union = len(cur | prev)
        assert row["n_cur"] == len(cur)
        assert row["n_prev"] == len(prev)
        assert row["n_inter"] == inter
        assert row["jac_ppm"] == (1_000_000 * inter) // union
