"""Greedy k-center coreset (ops/coreset.py) vs a brute-force
reference, hand-checked geometry, and edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _pts_ds(ids, xs, ys, parts=5):
    import ray.data as rd

    df = pd.DataFrame({"id": ids, "x": xs, "y": ys}).astype("int64")
    return rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(parts)


def _ref_kcenter(ids, xs, ys, k):
    ids = np.asarray(ids, dtype=np.int64)
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    order = np.argsort(ids)
    ids, xs, ys = ids[order], xs[order], ys[order]
    sel = [(0, int(ids[0]), 0)]
    d2 = (xs - xs[0]) ** 2 + (ys - ys[0]) ** 2
    for r in range(1, k):
        m = d2.max()
        if m == 0:
            break
        i = int(np.flatnonzero(d2 == m)[0])  # ids ascending -> min id
        sel.append((r, int(ids[i]), int(m)))
        d2 = np.minimum(d2, (xs - xs[i]) ** 2 + (ys - ys[i]) ** 2)
    return pd.DataFrame(
        sel, columns=["center_rank", "id", "radius2"]
    ).astype("int64")


def test_kcenter_hand_checked_square(ray_session):
    from ocr_service_ray.ops.coreset import kcenter_greedy

    # unit square corners + center: seed=id 1 (0,0); farthest = (10,10);
    # then the remaining corners; the middle point joins last
    ids = [1, 2, 3, 4, 5]
    xs = [0, 10, 0, 10, 5]
    ys = [0, 0, 10, 10, 5]
    out = kcenter_greedy(_pts_ds(ids, xs, ys), "id", "x", "y", 5)
    assert list(out["id"]) == [1, 4, 2, 3, 5]
    assert list(out["radius2"]) == [0, 200, 100, 100, 50]


def test_kcenter_matches_reference_random(ray_session):
    from ocr_service_ray.ops.coreset import kcenter_greedy

    rng = np.random.RandomState(31)
    n = 400
    ids = rng.permutation(10_000)[:n]
    xs = rng.randint(-1_000_000, 1_000_000, n)
    ys = rng.randint(-1_000_000, 1_000_000, n)
    out = kcenter_greedy(_pts_ds(ids, xs, ys, parts=7), "id", "x", "y", 12)
    ref = _ref_kcenter(ids, xs, ys, 12)
    pd.testing.assert_frame_equal(out, ref)
    # covering radius is non-increasing after the seed
    r = out["radius2"].to_numpy()[1:]
    assert (np.diff(r) <= 0).all()
    assert out["id"].is_unique


def test_kcenter_early_stop_and_empty(ray_session):
    from ocr_service_ray.ops.coreset import kcenter_greedy

    # 3 distinct locations (one duplicated) -> stops at 3 centers
    out = kcenter_greedy(
        _pts_ds([1, 2, 3, 4], [0, 0, 5, 9], [0, 0, 5, 9], parts=2),
        "id",
        "x",
        "y",
        10,
    )
    assert len(out) == 3
    assert list(out["id"]) == [1, 4, 3]
    empty = kcenter_greedy(
        _pts_ds([], [], [], parts=1), "id", "x", "y", 4
    )
    assert len(empty) == 0
