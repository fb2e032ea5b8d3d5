"""Wave-112 ops: weighted interval scheduling DP — vs brute force."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _run(table: dict) -> pd.DataFrame:
    from ocr_service_ray.ops.intervals import weighted_interval_max

    out = weighted_interval_max(
        _ds(table), "k", "s", "f", "v", "tie"
    ).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def _brute(s, f, v) -> int:
    """Exhaustive max-value non-overlapping subset (f_j <= s_i compatible)."""
    n = len(s)
    best = 0
    for r in range(n + 1):
        for sub in itertools.combinations(range(n), r):
            ok = all(
                f[a] <= s[b] or f[b] <= s[a]
                for a, b in itertools.combinations(sub, 2)
            )
            if ok:
                best = max(best, sum(v[i] for i in sub))
    return best


def test_weighted_interval_hand_checked():
    # Kleinberg-Tardos style: [0,3]v=5, [2,5]v=6, [4,7]v=5 ->
    # {first, third} = 10 beats the middle alone (6)
    out = _run(
        {
            "k": ["u", "u", "u"],
            "s": [0, 2, 4],
            "f": [3, 5, 7],
            "v": [5, 6, 5],
            "tie": [1, 2, 3],
        }
    )
    assert out.loc[0, "best_v"] == 10
    assert out.loc[0, "n_events"] == 3
    assert out.loc[0, "total_v"] == 16


def test_weighted_interval_back_to_back_compatible():
    # f == s counts as compatible: [0,5] + [5,10] both keepable
    out = _run(
        {
            "k": ["u", "u"],
            "s": [0, 5],
            "f": [5, 10],
            "v": [3, 4],
            "tie": [1, 2],
        }
    )
    assert out.loc[0, "best_v"] == 7


def test_weighted_interval_brute_force_random():
    rng = np.random.RandomState(112)
    rows = {"k": [], "s": [], "f": [], "v": [], "tie": []}
    expected = {}
    for key in ["a", "b", "c", "d"]:
        n = int(rng.randint(4, 11))
        s = rng.randint(0, 50, n)
        f = s + rng.randint(1, 20, n)
        v = rng.randint(1, 100, n)
        rows["k"] += [key] * n
        rows["s"] += s.tolist()
        rows["f"] += f.tolist()
        rows["v"] += v.tolist()
        rows["tie"] += list(range(n))
        expected[key] = _brute(s.tolist(), f.tolist(), v.tolist())
    out = _run(rows)
    got = dict(zip(out["k"], out["best_v"]))
    assert got == expected


def test_weighted_interval_layout_invariance():
    # same rows split across blocks / shuffled -> identical result
    rng = np.random.RandomState(7)
    n = 60
    table = {
        "k": [f"u{i % 5}" for i in range(n)],
        "s": rng.randint(0, 1000, n).tolist(),
        "v": rng.randint(1, 50, n).tolist(),
        "tie": list(range(n)),
    }
    table["f"] = [s + int(d) for s, d in zip(table["s"], rng.randint(1, 200, n))]
    base = _run(table)

    import ray.data as rd

    perm = rng.permutation(n)
    shuf = {c: [table[c][i] for i in perm] for c in table}
    from ocr_service_ray.ops.intervals import weighted_interval_max

    split = rd.from_arrow(pa.table(shuf)).repartition(7)
    out = (
        weighted_interval_max(split, "k", "s", "f", "v", "tie")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, out)
