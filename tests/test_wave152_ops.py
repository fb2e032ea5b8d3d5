"""Wave-152 ops: closest pair sweep — heavy random brute parity
(including clustered/duplicate/tie-rich configurations), edge
cases, layout invariance."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.closestpair import closest_pair


def _df(ids, xs, ys):
    return pd.DataFrame({"user_id": ids, "x": xs, "y": ys})


def _brute(ids, xs, ys):
    best = None
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2
            a, b = sorted((ids[i], ids[j]))
            cand = (d2, a, b)
            if best is None or cand < best:
                best = cand
    return best


def test_simple():
    out = closest_pair(_df([1, 2, 3], [0, 10, 11], [0, 0, 0]), "user_id", "x", "y")
    assert list(out.iloc[0]) == [2, 3, 1]


def test_duplicates_zero_distance():
    out = closest_pair(
        _df([5, 9, 2], [7, 7, 100], [3, 3, 3]), "user_id", "x", "y"
    )
    assert list(out.iloc[0]) == [5, 9, 0]


def test_tie_breaks_to_smallest_ids():
    # two pairs at identical distance 4: (1,2) and (8,9) -> (1,2)
    out = closest_pair(
        _df([1, 2, 8, 9], [0, 2, 100, 102], [0, 0, 50, 50]),
        "user_id", "x", "y",
    )
    assert list(out.iloc[0]) == [1, 2, 4]


def test_fewer_than_two_points():
    assert len(closest_pair(_df([1], [0], [0]), "user_id", "x", "y")) == 0
    assert len(closest_pair(_df([], [], []), "user_id", "x", "y")) == 0


def test_random_vs_brute():
    rng = np.random.RandomState(152)
    for trial in range(40):
        n = int(rng.randint(2, 120))
        if trial % 3 == 0:
            # tie-rich small grid
            xs = rng.randint(0, 8, n)
            ys = rng.randint(0, 8, n)
        elif trial % 3 == 1:
            # two tight clusters far apart
            xs = np.concatenate(
                [rng.randint(0, 20, n // 2 + 1), rng.randint(10**6, 10**6 + 20, n // 2 + 1)]
            )[:n]
            ys = rng.randint(0, 20, n)
        else:
            xs = rng.randint(-(10**5), 10**5, n)
            ys = rng.randint(-(10**5), 10**5, n)
        ids = list(rng.permutation(n * 3)[:n])
        xs, ys = [int(v) for v in xs], [int(v) for v in ys]
        got = closest_pair(_df(ids, xs, ys), "user_id", "x", "y")
        b = _brute(ids, xs, ys)
        assert tuple(got.iloc[0][["dist2", "id_a", "id_b"]]) == (b[0], b[1], b[2])
        # shuffled layout gives the identical answer
        perm = rng.permutation(n)
        got2 = closest_pair(
            _df([ids[i] for i in perm], [xs[i] for i in perm], [ys[i] for i in perm]),
            "user_id", "x", "y",
        )
        pd.testing.assert_frame_equal(got, got2)
