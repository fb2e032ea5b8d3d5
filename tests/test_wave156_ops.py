"""Wave-156 ops: union of rectangles — closed forms, rasterized
brute parity, degenerate boxes."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.rectunion import rect_union_report, union_area


def _df(rows):
    return pd.DataFrame(rows, columns=["x1", "x2", "y1", "y2"])


def _brute(rects):
    cells = set()
    for _, r in rects.iterrows():
        for x in range(int(r["x1"]), int(r["x2"]) + 1):
            for y in range(int(r["y1"]), int(r["y2"]) + 1):
                cells.add((x, y))
    return len(cells)


def test_disjoint_and_nested():
    assert union_area(_df([(0, 1, 0, 1), (5, 6, 5, 6)])) == 8
    assert union_area(_df([(0, 9, 0, 9), (2, 3, 2, 3)])) == 100  # nested
    assert union_area(_df([(0, 0, 0, 0)])) == 1  # point box


def test_partial_overlap():
    # 3x3 and 3x3 overlapping in a 2x2 corner: 9 + 9 - 4
    assert union_area(_df([(0, 2, 0, 2), (1, 3, 1, 3)])) == 14


def test_report_fields():
    out = rect_union_report(_df([(0, 2, 0, 2), (1, 3, 1, 3)]))
    assert out.loc[0, "n_rects"] == 2
    assert out.loc[0, "union_area"] == 14
    assert out.loc[0, "sum_area"] == 18
    assert out.loc[0, "overlap_ppm"] == 1_000_000 * 14 // 18


def test_empty():
    out = rect_union_report(_df([]))
    assert list(out.iloc[0]) == [0, 0, 0, 0]


def test_random_vs_rasterized_brute():
    rng = np.random.RandomState(156)
    for _ in range(30):
        n = int(rng.randint(1, 15))
        rows = []
        for _ in range(n):
            x1 = int(rng.randint(-10, 10))
            y1 = int(rng.randint(-10, 10))
            rows.append(
                (x1, x1 + int(rng.randint(0, 8)), y1, y1 + int(rng.randint(0, 8)))
            )
        rects = _df(rows)
        assert union_area(rects) == _brute(rects)
