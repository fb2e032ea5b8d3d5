"""Wave-164 ops: STR packing — partition accounting, leaf capacity,
tiling structure, brute reference parity."""

import math

import numpy as np
import pandas as pd

from ocr_service_ray.ops.strpack import str_pack_stats


def _pts(ids, xs, ys):
    return pd.DataFrame({"user_id": ids, "x": xs, "y": ys})


def _ref(ids, xs, ys, cap):
    rows = sorted(zip(xs, ids, ys))
    n = len(rows)
    S = math.ceil(math.sqrt(math.ceil(n / cap)))
    assign = {}
    for rx, (x, i, y) in enumerate(rows):
        assign[i] = rx // (S * cap)
    by_slab = {}
    for x, i, y in rows:
        by_slab.setdefault(assign[i], []).append((y, i, x))
    leaf = {}
    for slab, members in by_slab.items():
        for ry, (y, i, x) in enumerate(sorted(members)):
            leaf[i] = slab * S + ry // cap
    return leaf


def test_everything_accounted():
    rng = np.random.RandomState(164)
    n = 300
    ids = list(range(n))
    xs = [int(v) for v in rng.randint(0, 10**6, n)]
    ys = [int(v) for v in rng.randint(0, 1000, n)]
    out = str_pack_stats(_pts(ids, xs, ys), "user_id", "x", "y", capacity=64)
    assert out["n_pts"].sum() == n
    assert (out["n_pts"] <= 64).all()
    # MBRs honest
    assert (out["min_x"] <= out["max_x"]).all()


def test_matches_reference_assignment():
    rng = np.random.RandomState(41)
    n = 200
    ids = list(rng.permutation(1000)[:n])
    xs = [int(v) for v in rng.randint(0, 5000, n)]
    ys = [int(v) for v in rng.randint(0, 5000, n)]
    ref = _ref(ids, xs, ys, 64)
    from collections import Counter

    ref_counts = Counter(ref.values())
    out = str_pack_stats(_pts(ids, xs, ys), "user_id", "x", "y", capacity=64)
    got_counts = dict(zip(out["leaf_id"], out["n_pts"]))
    assert got_counts == dict(ref_counts)


def test_tiling_reduces_bbox_vs_one_leaf():
    # a uniform grid packed into 64-leaves must have total bbox area
    # far below n_leaves * full-extent area
    xs, ys = np.meshgrid(np.arange(32), np.arange(32))
    ids = list(range(1024))
    out = str_pack_stats(
        _pts(ids, xs.ravel(), ys.ravel()), "user_id", "x", "y", capacity=64
    )
    full = 32 * 32
    assert (out["bbox_area"] < full).all()
    assert len(out) == 16  # 1024/64 exact


def test_empty_and_tiny():
    out = str_pack_stats(_pts([], [], []), "user_id", "x", "y")
    assert len(out) == 0
    out = str_pack_stats(_pts([7], [3], [4]), "user_id", "x", "y")
    assert list(out.iloc[0]) == [0, 1, 3, 3, 4, 4, 1]
