"""Wave-130 ops: convex hull — known polygons, hull-of-hulls merge
property, collinear strictness, containment invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(pts):
    import ray.data as rd

    x, y = zip(*pts)
    return rd.from_arrow(
        pa.table(
            {
                "x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64()),
            }
        )
    )


def test_hull_square_with_interior():
    from ocr_service_ray.ops.hull import convex_hull

    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (3, 7), (5, 0)]
    out = convex_hull(_ds(pts), "x", "y")
    assert out["n_vertices"].iloc[0] == 4  # (5,0) collinear, dropped
    assert set(zip(out["x"], out["y"])) == {(0, 0), (10, 0), (10, 10), (0, 10)}
    assert out["area2"].iloc[0] == 200


def test_hull_collinear_degenerates():
    from ocr_service_ray.ops.hull import monotone_chain, shoelace2

    h = monotone_chain([(0, 0), (1, 1), (2, 2), (3, 3)])
    assert shoelace2(h) == 0


def test_hull_of_hulls_merge_property():
    from ocr_service_ray.ops.hull import monotone_chain

    rng = np.random.RandomState(130)
    pts = [(int(a), int(b)) for a, b in rng.randint(-500, 500, (300, 2))]
    direct = monotone_chain(pts)
    # split into 5 chunks, hull each, hull the union
    merged = monotone_chain(
        [p for i in range(5) for p in monotone_chain(pts[i * 60 : (i + 1) * 60])]
    )
    assert direct == merged


def test_hull_contains_all_points():
    from ocr_service_ray.ops.hull import _cross, convex_hull

    rng = np.random.RandomState(7)
    pts = [(int(a), int(b)) for a, b in rng.randint(0, 1000, (200, 2))]
    out = convex_hull(_ds(pts).repartition(6), "x", "y")
    hull = list(zip(out["x"], out["y"]))
    n = len(hull)
    for p in pts:  # every point on or inside every CCW edge
        for i in range(n):
            assert _cross(hull[i], hull[(i + 1) % n], p) >= 0


def test_hull_layout_invariance():
    from ocr_service_ray.ops.hull import convex_hull

    rng = np.random.RandomState(3)
    pts = [(int(a), int(b)) for a, b in rng.randint(-99, 99, (120, 2))]
    base = convex_hull(_ds(pts), "x", "y")
    out = convex_hull(_ds(pts[::-1]).repartition(7), "x", "y")
    pd.testing.assert_frame_equal(base, out)
