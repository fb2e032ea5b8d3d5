"""Wave-122 ops: butterfly counting — brute force, complete biclique
closed form, side rule, layout invariance."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(edges):
    import ray.data as rd

    l, r = zip(*edges)
    return rd.from_arrow(
        pa.table(
            {
                "l": pa.array(l, type=pa.int64()),
                "r": pa.array(r, type=pa.int64()),
            }
        )
    )


def _brute(edges):
    es = set(edges)
    lefts = sorted({u for u, _ in es})
    rights = sorted({v for _, v in es})
    bf = 0
    for u, w in itertools.combinations(lefts, 2):
        for x, y in itertools.combinations(rights, 2):
            if (u, x) in es and (u, y) in es and (w, x) in es and (w, y) in es:
                bf += 1
    return bf


def test_butterfly_complete_biclique():
    from ocr_service_ray.ops.butterfly import butterfly_count

    # K_{3,4}: C(3,2)*C(4,2) = 18 butterflies
    edges = [(u, 100 + v) for u in range(3) for v in range(4)]
    out = butterfly_count(_ds(edges), "l", "r")
    assert out["n_butterflies"].iloc[0] == 18
    assert out["n_edges"].iloc[0] == 12
    # pair totals: left anchors = sum_l C(4,2) = 18, right anchors =
    # sum_r C(3,2) = 12 -> wedges generated from the right side
    assert out["wedge_side"].iloc[0] == 1
    assert out["n_wedges"].iloc[0] == 12


def test_butterfly_random_vs_brute():
    from ocr_service_ray.ops.butterfly import butterfly_count

    rng = np.random.RandomState(122)
    for _ in range(5):
        edges = list(
            {
                (int(rng.randint(8)), 100 + int(rng.randint(8)))
                for _ in range(30)
            }
        )
        out = butterfly_count(_ds(edges), "l", "r")
        assert out["n_butterflies"].iloc[0] == _brute(edges)


def test_butterfly_duplicate_edges_collapse():
    from ocr_service_ray.ops.butterfly import butterfly_count

    edges = [(0, 10), (0, 11), (1, 10), (1, 11)]
    out1 = butterfly_count(_ds(edges), "l", "r")
    out2 = butterfly_count(_ds(edges * 3), "l", "r")
    pd.testing.assert_frame_equal(out1, out2)
    assert out1["n_butterflies"].iloc[0] == 1


def test_butterfly_layout_invariance():
    from ocr_service_ray.ops.butterfly import butterfly_count

    rng = np.random.RandomState(9)
    edges = list(
        {(int(rng.randint(10)), 50 + int(rng.randint(12))) for _ in range(40)}
    )
    base = butterfly_count(_ds(edges), "l", "r")
    out = butterfly_count(_ds(edges[::-1]).repartition(7), "l", "r")
    pd.testing.assert_frame_equal(base, out)
