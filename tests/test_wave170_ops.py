"""Wave-170 ops: Morton range planning — quadtree runs vs brute cell
enumeration, coverage accounting, aligned-box closed forms."""

import numpy as np

from ocr_service_ray.ops.zrange import morton_runs
from ocr_service_ray.ops.zorder import morton_interleave


def _brute_runs(bits, box):
    bx0, bx1, by0, by1 = box
    xs, ys = np.meshgrid(
        np.arange(bx0, bx1 + 1), np.arange(by0, by1 + 1)
    )
    z = np.sort(
        morton_interleave(
            xs.ravel().astype(np.int64), ys.ravel().astype(np.int64), bits
        )
    )
    runs = []
    s = e = int(z[0])
    for v in z[1:]:
        v = int(v)
        if v == e + 1:
            e = v
        else:
            runs.append((s, e))
            s = e = v
    runs.append((s, e))
    return runs


def test_aligned_box_is_one_run():
    # a whole aligned quadrant is a single contiguous run
    assert morton_runs(5, (0, 15, 0, 15)) == [(0, 255)]
    assert morton_runs(5, (16, 31, 16, 31)) == [(768, 1023)]


def test_full_grid_one_run():
    assert morton_runs(5, (0, 31, 0, 31)) == [(0, 1023)]


def test_cell_count_conservation():
    box = (5, 18, 9, 26)
    runs = morton_runs(5, box)
    assert sum(e - s + 1 for s, e in runs) == 14 * 18
    # runs strictly ordered, non-overlapping, non-adjacent
    for (s1, e1), (s2, e2) in zip(runs, runs[1:]):
        assert e1 + 1 < s2


def test_random_boxes_vs_brute():
    rng = np.random.RandomState(170)
    for _ in range(25):
        x0 = int(rng.randint(0, 28))
        y0 = int(rng.randint(0, 28))
        box = (
            x0,
            min(31, x0 + int(rng.randint(0, 20))),
            y0,
            min(31, y0 + int(rng.randint(0, 20))),
        )
        assert morton_runs(5, box) == _brute_runs(5, box)
