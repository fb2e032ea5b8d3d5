"""Wave-14 ops: grouped OLS, CUSUM peak, time-weighted average,
activity bitmaps, Benford digits, pair lift — vs brute-force
references (numpy lstsq / O(n^2) folds)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def test_grouped_ols_matches_numpy_fit(ray_session):
    from ocr_service_ray.ops.trend import grouped_ols

    rng = np.random.RandomState(7)
    x = rng.randint(0, 50, 200)
    y = (3 * x + 17 + rng.randint(-5, 6, 200)).astype(np.int64)
    g = np.where(x % 2 == 0, "a", "b")
    out = (
        grouped_ols(_ds({"g": g.tolist(), "x": x, "y": y}), ["g"], "x", "y")
        .set_index("g")
        .sort_index()
    )
    for key in ("a", "b"):
        m = g == key
        n = int(m.sum())
        sx, sy = int(x[m].sum()), int(y[m].sum())
        sxx = int((x[m].astype(np.int64) ** 2).sum())
        sxy = int((x[m].astype(np.int64) * y[m]).sum())
        den = n * sxx - sx * sx
        slope = (1_000_000 * (n * sxy - sx * sy)) // den
        icept = (1_000_000 * sy - slope * sx) // n
        assert out.loc[key, "slope_micro"] == slope
        assert out.loc[key, "icept_micro"] == icept
        # sanity: within rounding of the float fit
        fit = np.polyfit(x[m], y[m], 1)
        assert abs(slope / 1e6 - fit[0]) < 0.5
        assert abs(icept / 1e6 - fit[1]) < 25


def test_grouped_ols_drops_degenerate_group(ray_session):
    from ocr_service_ray.ops.trend import grouped_ols

    out = grouped_ols(
        _ds({"g": ["c", "c", "d", "d"], "x": [5, 5, 1, 2], "y": [1, 9, 3, 5]}),
        ["g"],
        "x",
        "y",
    )
    assert out["g"].tolist() == ["d"]
    assert out.loc[0, "slope_micro"] == 2_000_000


def test_cusum_peak_brute(ray_session):
    from ocr_service_ray.ops.trend import cusum_peak

    # key "a": burst on day 3-4; key "b": uniform
    days = [1, 1, 3, 3, 3, 4, 4] + [1, 2, 3, 4]
    keys = ["a"] * 7 + ["b"] * 4
    ts = pd.to_datetime(["2024-01-0%d" % d for d in days])
    out = cusum_peak(_ds({"k": keys, "ts": ts}), "k", "ts").set_index("k")
    d = 4  # grid days 1..4
    for key in ("a", "b"):
        n = np.array(
            [days[:7].count(p) if key == "a" else days[7:].count(p) + 0
             for p in range(1, 5)]
        )
        if key == "b":
            n = np.array([1, 1, 1, 1])
        total = n.sum()
        scaled = d * np.cumsum(n) - np.arange(1, 5) * total
        assert out.loc[key, "peak_scaled"] == scaled.max()
        assert out.loc[key, "n_days"] == 4
        assert out.loc[key, "total"] == total
        # earliest argmax day (epoch days of 2024-01-0x)
        base = pd.Timestamp("2024-01-01").to_datetime64().astype("datetime64[D]")
        want = int(base.astype(np.int64)) + int(np.flatnonzero(scaled == scaled.max()).min())
        assert out.loc[key, "peak_day"] == want


def test_time_weighted_avg_brute(ray_session):
    from ocr_service_ray.ops.trend import time_weighted_avg

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",
            "2024-01-01 00:00:10",
            "2024-01-01 00:01:00",  # gaps: 10s, 50s
            "2024-01-01 00:00:00",
            "2024-01-01 00:00:00.4",  # sub-second gap -> w == 0 -> dropped
        ],
        format="ISO8601",
    )
    out = time_weighted_avg(
        _ds(
            {
                "u": [1, 1, 1, 2, 2],
                "ts": ts,
                "i": [0, 1, 2, 3, 4],
                "v": [100, 200, 999, 5, 7],
            }
        ),
        "u",
        "ts",
        "v",
        ["ts", "i"],
    ).to_pandas()
    assert out["u"].tolist() == [1]
    assert out.loc[0, "w_seconds"] == 60
    assert out.loc[0, "tw_value"] == (100 * 10 + 200 * 50) // 60


def test_activity_bitmap_dom_and_hour(ray_session):
    from ocr_service_ray.ops.bitmap import activity_bitmap

    ts = pd.to_datetime(
        [
            "2024-01-01 05:00",
            "2024-01-01 05:30",  # same (dom, hour) — dedupes
            "2024-01-15 23:00",
            "2024-01-31 00:00",
        ]
    )
    ds = _ds({"u": [9, 9, 9, 9], "ts": ts})
    dom = activity_bitmap(ds, "u", "ts", unit="day_of_month").to_pandas()
    assert dom.loc[0, "bitmap"] == (1 << 0) | (1 << 14) | (1 << 30)
    assert dom.loc[0, "n_active"] == 3
    hod = activity_bitmap(ds, "u", "ts", unit="hour_of_day").to_pandas()
    assert hod.loc[0, "bitmap"] == (1 << 5) | (1 << 23) | (1 << 0)
    assert hod.loc[0, "n_active"] == 3


def test_first_digit_counts_brute(ray_session):
    from ocr_service_ray.ops.sketch import first_digit_counts

    vals = [1, 19, 123, 2, 250, 9, 900, 31, -5, 0]
    out = first_digit_counts(_ds({"v": vals}), "v")
    pos = [v for v in vals if v > 0]
    want = pd.Series([int(str(v)[0]) for v in pos]).value_counts().sort_index()
    assert out["digit"].tolist() == want.index.tolist()
    assert out["n"].tolist() == want.tolist()
    assert (
        out["share_ppm"].to_numpy()
        == want.to_numpy() * 1_000_000 // len(pos)
    ).all()


def test_pair_lift_brute(ray_session):
    from itertools import combinations

    from ocr_service_ray.ops.lift import pair_lift

    baskets = {
        1: {"x", "y"},
        2: {"x", "y", "z"},
        3: {"x"},
        4: {"y", "z"},
        5: {"z"},
    }
    rows_b, rows_i = [], []
    for b, items in baskets.items():
        for i in sorted(items) * 2:  # duplicates must not matter
            rows_b.append(b)
            rows_i.append(i)
    out = (
        pair_lift(_ds({"b": rows_b, "i": rows_i}), "b", "i")
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    marg = {"x": 3, "y": 3, "z": 3}
    pairs = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    assert len(out) == len(pairs)
    for _, r in out.iterrows():
        key = (r["item_a"], r["item_b"])
        assert r["n_pair"] == pairs[key]
        assert r["n_baskets"] == 5
        assert r["lift_ppm"] == (
            1_000_000 * pairs[key] * 5 // (marg[key[0]] * marg[key[1]])
        )


def test_grouped_ols2_matches_lstsq_and_handles_singular(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.stats import grouped_ols2

    rng = np.random.RandomState(7)
    n = 2_000
    x1 = rng.randint(0, 24, n)
    x2 = rng.randint(0, 7, n)
    y = 3 * x1 - 5 * x2 + 17 + rng.randint(-3, 4, n)
    df = pd.DataFrame(
        {
            "g": np.where(np.arange(n) % 2 == 0, "a", "b"),
            "x1": x1.astype(np.int64),
            "x2": x2.astype(np.int64),
            "y": y.astype(np.int64),
        }
    )
    # group 'c' has constant x1 == x2 == 1 -> singular normal matrix
    sing = pd.DataFrame(
        {"g": ["c"] * 5, "x1": [1] * 5, "x2": [1] * 5, "y": [1, 2, 3, 4, 5]}
    )
    ds = rd.from_arrow(
        pa.Table.from_pandas(pd.concat([df, sing]), preserve_index=False)
    ).repartition(6)
    out = grouped_ols2(ds, ["g"], "x1", "x2", "y").set_index("g")
    for g in ("a", "b"):
        sub = df[df["g"] == g]
        X = np.stack([np.ones(len(sub)), sub["x1"], sub["x2"]], axis=1)
        beta = np.linalg.lstsq(X, sub["y"].astype(float), rcond=None)[0]
        got = [
            out.loc[g, "beta0_micro"],
            out.loc[g, "beta1_micro"],
            out.loc[g, "beta2_micro"],
        ]
        for b_hat, b_ref in zip(got, beta):
            assert abs(int(b_hat) / 1e6 - b_ref) < 2e-6, (g, got, beta)
    assert pd.isna(out.loc["c", "beta0_micro"])
    # layout invariance of the full output table
    out1 = grouped_ols2(
        rd.from_arrow(
            pa.Table.from_pandas(pd.concat([df, sing]), preserve_index=False)
        ).repartition(1),
        ["g"],
        "x1",
        "x2",
        "y",
    )
    pd.testing.assert_frame_equal(
        out.reset_index().sort_values("g").reset_index(drop=True),
        out1.sort_values("g").reset_index(drop=True),
    )
