"""Wave-22 ops: Apriori frequent triples, session bounce rate,
burstiness classes — vs brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts_us(us_list):
    base = np.datetime64("2024-03-01", "us")
    return [base + np.timedelta64(int(u), "us") for u in us_list]


def test_frequent_triples_brute_force():
    from itertools import combinations

    from ocr_service_ray.ops.lift import frequent_triples

    rng = np.random.RandomState(21)
    baskets, items = [], []
    for b in range(40):
        for it in rng.choice(20, size=rng.randint(2, 6), replace=False):
            baskets.append(b)
            items.append(int(it))
    # plant a repeated triple family
    for b in (100, 101, 102):
        for it in (1, 2, 3, 4):
            baskets.append(b)
            items.append(it)
    out = (
        frequent_triples(_ds({"b": baskets, "i": items}), "b", "i", min_support=2)
        .to_pandas()
        .sort_values(["item_a", "item_b", "item_c"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"b": baskets, "i": items}).drop_duplicates()
    expect = {}
    for _, g in df.groupby("b"):
        for tri in combinations(sorted(g["i"]), 3):
            expect[tri] = expect.get(tri, 0) + 1
    expect = sorted((k, v) for k, v in expect.items() if v >= 2)
    got = [
        ((r["item_a"], r["item_b"], r["item_c"]), r["n_baskets"])
        for _, r in out.iterrows()
    ]
    assert got == expect
    assert ((1, 2, 3), 3) in got  # the planted family


def test_bounce_rate_by_entry_sessions():
    from ocr_service_ray.ops.retention import bounce_rate_by_entry

    MIN = 60 * 1_000_000
    # u1: [view@0, click@10min] one session (entry view, no bounce);
    #     [error@60min] second session (bounce)
    # u2: [signup@0] bounce
    us = [0, 10 * MIN, 70 * MIN, 0]
    users = [1, 1, 1, 2]
    types = ["view", "click", "error", "signup"]
    ids = [1, 2, 3, 4]
    out = (
        bounce_rate_by_entry(
            _ds(
                {
                    "user_id": users,
                    "ts": _ts_us(us),
                    "event_type": types,
                    "event_id": ids,
                }
            )
        )
        .to_pandas()
        .set_index("entry_type")
    )
    assert out.loc["view", "n_sessions"] == 1
    assert out.loc["view", "n_bounces"] == 0
    assert out.loc["error", "n_bounces"] == 1
    assert out.loc["signup", "bounce_ppm"] == 1_000_000
    assert "click" not in out.index  # never an entry type
    # exactly 30-min gap does NOT split (strictly greater contract)
    edge = (
        bounce_rate_by_entry(
            _ds(
                {
                    "user_id": [1, 1],
                    "ts": _ts_us([0, 30 * MIN]),
                    "event_type": ["view", "click"],
                    "event_id": [1, 2],
                }
            )
        )
        .to_pandas()
    )
    assert edge["n_sessions"].sum() == 1


def test_burstiness_classes_buckets():
    from ocr_service_ray.ops.retention import burstiness_classes

    SEC = 1_000_000
    rows_u, rows_t = [], []
    # regular: metronome every 10s -> cv2 0
    for i in range(10):
        rows_u.append(1)
        rows_t.append(i * 10 * SEC)
    # bursty: 9 events in one second burst + one 1000s later
    for i in range(9):
        rows_u.append(2)
        rows_t.append(i * SEC)
    rows_u.append(2)
    rows_t.append(9 * SEC + 1000 * SEC)
    # degenerate: single event
    rows_u.append(3)
    rows_t.append(0)
    # degenerate: two events same second
    rows_u += [4, 4]
    rows_t += [0, 500_000]
    out = (
        burstiness_classes(_ds({"user_id": rows_u, "ts": _ts_us(rows_t)}))
        .to_pandas()
        .set_index("class")["n_keys"]
        .to_dict()
    )
    assert out.get("regular") == 1
    assert out.get("bursty") == 1
    assert out.get("degenerate") == 2


def test_weighted_top_share_brute_force():
    from ocr_service_ray.ops.divergence import weighted_top_share_by_group

    rng = np.random.RandomState(30)
    g = rng.choice(["a", "b"], 300).tolist()
    m = rng.randint(0, 30, 300).tolist()
    w = rng.randint(1, 500, 300).tolist()
    out = (
        weighted_top_share_by_group(
            _ds({"g": g, "m": m, "w": w}), "g", "m", "w", top_pct=10
        )
        .to_pandas()
        .set_index("g")
    )
    df = pd.DataFrame({"g": g, "m": m, "w": w})
    for key, sub in df.groupby("g"):
        sums = sorted(sub.groupby("m")["w"].sum().tolist(), reverse=True)
        k = (len(sums) * 10 + 99) // 100
        expect = (1_000_000 * sum(sums[:k])) // sum(sums)
        assert out.loc[key, "top_share_ppm"] == expect
        assert out.loc[key, "weight_total"] == sum(sums)
