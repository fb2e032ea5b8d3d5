"""Wave-20 ops: rolling windowed correlation, seasonal outliers, OOV
rate, first-conversion lags — vs brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(days, secs=None):
    base = np.datetime64("2024-03-01", "us")
    secs = secs or [0] * len(days)
    return [
        base
        + np.timedelta64(int(d) * 86_400_000_000 + int(s) * 1_000_000, "us")
        for d, s in zip(days, secs)
    ]


def test_rolling_window_corr_perfect_and_anti():
    from ocr_service_ray.ops.trend import rolling_window_corr

    # a tracks b exactly -> r2 = +1e6 once the window has variance
    days_a = [0, 1, 1, 2, 2, 2]
    days_b = [0, 1, 1, 2, 2, 2]
    out = rolling_window_corr(
        _ds(
            {
                "k": ["a"] * len(days_a) + ["b"] * len(days_b),
                "ts": _ts(days_a + days_b),
            }
        ),
        "k",
        "a",
        "b",
        window=7,
    ).set_index("day")
    base = int(out.index.min())
    assert out.loc[base + 1, "rcorr2_ppm"] == 1_000_000
    assert out.loc[base + 2, "rcorr2_ppm"] == 1_000_000
    # day 0: single-point window -> den 0 -> emitted as 0
    assert out.loc[base, "rcorr2_ppm"] == 0


def test_rolling_window_corr_brute_force():
    from ocr_service_ray.ops.trend import rolling_window_corr

    rng = np.random.RandomState(3)
    days = rng.randint(0, 15, 400).tolist()
    keys = rng.choice(["x", "y", "z"], 400).tolist()  # z must be ignored
    out = rolling_window_corr(
        _ds({"k": keys, "ts": _ts(days)}), "k", "x", "y", window=7
    ).set_index("day")
    cx = np.zeros(15, dtype=np.int64)
    cy = np.zeros(15, dtype=np.int64)
    for d, k in zip(days, keys):
        if k == "x":
            cx[d] += 1
        elif k == "y":
            cy[d] += 1
    base = int(out.index.min())
    for i in range(15):
        lo = max(0, i - 6)
        ax, bx = cx[lo : i + 1], cy[lo : i + 1]
        n = len(ax)
        sx, sy = int(ax.sum()), int(bx.sum())
        sxx = int((ax * ax).sum())
        syy = int((bx * bx).sum())
        sxy = int((ax * bx).sum())
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        expect = 0 if den == 0 else (
            (1_000_000 * num * num) // den * (1 if num >= 0 else -1)
        )
        assert out.loc[base + i, "rcorr2_ppm"] == expect, i
        assert out.loc[base + i, "n_a"] == cx[i]


def test_seasonal_outliers_flags_spike():
    from ocr_service_ray.ops.trend import seasonal_outliers

    # 3 same-weekday occurrences with counts 1,1,4 -> avg 2; 4 > 2x2?
    # factor 2: 4*3 > 2*6 -> 12 > 12 false; factor 11/10: 12 > 6.6 -> true
    days = [0] + [7] + [14] * 4 + [1, 8, 15]  # second weekday flat
    out = seasonal_outliers(
        _ds({"k": ["a"] * len(days), "ts": _ts(days)}),
        "k",
        factor_num=11,
        factor_den=10,
    )
    epoch0 = int(np.datetime64("2024-03-01").astype("datetime64[D]").astype(int))
    assert len(out) == 1
    assert out["day"].iloc[0] == epoch0 + 14  # the spike day
    assert out["n"].iloc[0] == 4
    assert out["dow_days"].iloc[0] == 3
    assert out["dow_total"].iloc[0] == 6
    strict = seasonal_outliers(
        _ds({"k": ["a"] * len(days), "ts": _ts(days)}),
        "k",
        factor_num=2,
        factor_den=1,
    )
    assert len(strict) == 0


def test_oov_rate_by_group_topk_boundary():
    from ocr_service_ray.ops.text import oov_rate_by_group

    # corpus counts: aa x4, bb x3, cc x3, dd x1 — top-2 = {aa, bb}
    # (cc ties bb at 3 but 'bb' < 'cc' wins the boundary)
    out = oov_rate_by_group(
        _ds(
            {
                "source": ["s1", "s2"],
                "text": ["aa aa bb bb cc dd", "aa aa bb cc cc"],
            }
        ),
        vocab_k=2,
    ).set_index("source")
    assert out.loc["s1", "n_tokens"] == 6
    assert out.loc["s1", "n_oov"] == 2  # cc + dd
    assert out.loc["s2", "n_oov"] == 2  # cc x2
    assert out.loc["s1", "oov_ppm"] == 333_333


def test_first_conversion_lags_semantics():
    from ocr_service_ray.ops.retention import first_conversion_lags

    # u1: view@10s, purchase@70s -> lag 60; purchase@5s BEFORE the
    # view must not count. u2: purchase only -> dropped.
    # u3: view only -> dropped.
    out = (
        first_conversion_lags(
            _ds(
                {
                    "user_id": [1, 1, 1, 2, 3],
                    "ts": _ts([0, 0, 0, 0, 0], secs=[10, 70, 5, 30, 40]),
                    "event_type": [
                        "view",
                        "purchase",
                        "purchase",
                        "purchase",
                        "view",
                    ],
                }
            )
        )
        .to_pandas()
        .set_index("user_id")
    )
    assert out.index.tolist() == [1]
    assert out.loc[1, "lag_sec"] == 60
