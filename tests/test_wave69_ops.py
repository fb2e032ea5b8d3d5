"""Wave-69 ops: linear multi-touch attribution (ops/attribution.py)
and layout reading order (ops/layout.py) — hand-computed credit
splits, exact-sum invariant, column clustering identities, layout
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(rows):
    # rows: (event_id, us, user, type)
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )


HOUR = 3600 * 1_000_000


def test_attribution_hand_computed():
    import ray.data as rd

    from ocr_service_ray.ops.attribution import linear_attribution

    rows = [
        # user 1: 3 touches then a purchase → 333333×2 + 333334 (earliest)
        (1, 1 * HOUR, 1, "view"),
        (2, 2 * HOUR, 1, "click"),
        (3, 3 * HOUR, 1, "view"),
        (4, 4 * HOUR, 1, "purchase"),
        # user 2: touch OUTSIDE the 24h window → unattributed
        (5, 0, 2, "view"),
        (6, 30 * HOUR, 2, "purchase"),
        # user 3: purchase with no touches at all → unattributed
        (7, 5 * HOUR, 3, "purchase"),
    ]
    out = linear_attribution(rd.from_arrow(_events(rows)))
    got = {r["event_type"]: r for _, r in out.iterrows()}
    # view credits: earliest touch (id 1) gets 333333+1, id 3 gets 333333
    assert got["view"]["n_credits"] == 2
    assert got["view"]["total_credit_ppm"] == 333334 + 333333
    assert got["click"]["n_credits"] == 1
    assert got["click"]["total_credit_ppm"] == 333333
    assert got["view"]["n_unattributed"] == 2
    # exact-sum invariant: all credits of the attributed purchase = 1e6
    assert (
        int(got["view"]["total_credit_ppm"]) + int(got["click"]["total_credit_ppm"])
        == 1_000_000
    )


def test_attribution_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.attribution import linear_attribution

    rng = np.random.default_rng(5)
    n = 3000
    rows = [
        (
            i,
            int(rng.integers(0, 100 * HOUR)),
            int(rng.integers(0, 40)),
            rng.choice(["view", "click", "purchase", "error"]),
        )
        for i in range(n)
    ]
    t = _events(rows)
    o1 = linear_attribution(rd.from_arrow(t))
    o2 = linear_attribution(rd.from_arrow(t).repartition(11))
    assert o1.equals(o2)


def test_reading_order_two_columns():
    import ray.data as rd

    from ocr_service_ray.ops.layout import reading_order

    # page 0: left column x∈{10,20}, right column x∈{500,510};
    # reading order must finish the left column (top to bottom)
    # before starting the right one.
    spans = pa.table(
        {
            "page_id": pa.array([0] * 4, pa.int64()),
            "span_id": pa.array([1, 2, 3, 4], pa.int64()),
            "x": pa.array([500, 10, 20, 510], pa.int64()),
            "y": pa.array([5, 50, 5, 50], pa.int64()),
        }
    )
    out = (
        reading_order(rd.from_arrow(spans), gap_threshold=100)
        .to_pandas()
        .sort_values("read_order")
    )
    assert list(out["span_id"]) == [3, 2, 1, 4]
    assert list(out["column_id"]) == [0, 0, 1, 1]


def test_reading_order_layout_invariance_and_density():
    import ray.data as rd

    from ocr_service_ray.ops.layout import reading_order

    rng = np.random.default_rng(8)
    n = 2000
    spans = pa.table(
        {
            "page_id": pa.array(rng.integers(0, 25, n).astype(np.int64)),
            "span_id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
            "y": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        }
    )
    key = ["page_id", "span_id"]
    o1 = (
        reading_order(rd.from_arrow(spans))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    o2 = (
        reading_order(rd.from_arrow(spans).repartition(9))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert o1.equals(o2)
    # read_order is a dense 0..k-1 permutation per page
    per = o1.groupby("page_id")["read_order"]
    assert (per.min() == 0).all()
    assert (per.max() == per.count() - 1).all()
