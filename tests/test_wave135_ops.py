"""Wave-135 ops: dominance depth — quadratic parity, strictness on
ties, Pareto-front-zero invariant."""

import numpy as np
import pandas as pd


def _brute(df):
    out = []
    for _, p in df.iterrows():
        out.append(
            int(
                (
                    (df["x"] < p["x"]) & (df["y"] < p["y"])
                ).sum()
            )
        )
    return out


def test_dominance_hand_checked_and_ties():
    from ocr_service_ray.ops.dominance import dominance_depth

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "x": [0, 1, 1, 2, 2],
            "y": [0, 1, 0, 2, 0],
        }
    )
    out = dominance_depth(df, "id", "x", "y")
    # ties in x or y are NOT dominance (strict both)
    assert out["dominated_by"].tolist() == [0, 1, 0, 3, 0]


def test_dominance_random_vs_quadratic():
    from ocr_service_ray.ops.dominance import dominance_depth

    rng = np.random.RandomState(135)
    for _ in range(5):
        n = 200
        df = pd.DataFrame(
            {
                "id": range(n),
                "x": rng.randint(0, 40, n),
                "y": rng.randint(0, 40, n),
            }
        )
        out = dominance_depth(df, "id", "x", "y")
        ref = _brute(df.sort_values("id").reset_index(drop=True))
        assert out["dominated_by"].tolist() == ref


def test_dominance_pareto_front_is_zero():
    from ocr_service_ray.ops.dominance import dominance_depth

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "id": range(100),
            "x": rng.randint(0, 1000, 100),
            "y": rng.randint(0, 1000, 100),
        }
    )
    out = dominance_depth(df, "id", "x", "y")
    zeros = set(out.loc[out["dominated_by"] == 0, "id"])
    # the minimal point of x is always undominated
    assert int(df.loc[df["x"].idxmin(), "id"]) in zeros
    assert len(zeros) >= 1
