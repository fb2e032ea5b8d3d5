"""Wave-150 ops: exact Gini decision stump — hand-worked splits,
perfect-separation recovery, tie rule, brute Fraction parity."""

from fractions import Fraction

import pandas as pd
import pyarrow as pa
import pytest


def _mk(ray_session, cents, labels):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "value": [c / 100.0 for c in cents],
                "event_type": labels,
            }
        )
    )


def _brute_best(cents, ys, step, k_n):
    """Fraction-exact best threshold."""
    best_t, best_s = None, None
    n, p = len(cents), sum(ys)
    for k in range(k_n):
        t = step * (k + 1)
        nl = sum(1 for c in cents if c < t)
        pl = sum(y for c, y in zip(cents, ys) if c < t)
        nr, pr = n - nl, p - pl
        s = (
            (Fraction(pl * pl + (nl - pl) ** 2, nl) if nl else Fraction(0))
            + (Fraction(pr * pr + (nr - pr) ** 2, nr) if nr else Fraction(0))
        )
        if best_s is None or s > best_s:
            best_t, best_s = t, s
    return best_t


def test_perfect_separation(ray_session):
    from ocr_service_ray.ops.stump import stump_split

    # purchases all below 4000 cents, others all above
    cents = [1000, 1500, 3999, 9000, 12000, 15000]
    labels = ["purchase", "purchase", "purchase", "click", "view", "click"]
    out = stump_split(
        _mk(ray_session, cents, labels), "value", "event_type", "purchase",
        step=2000, n_thresholds=64,
    )
    best = out[out["is_best"] == 1]
    assert len(best) == 1
    row = best.iloc[0]
    assert row["threshold_cents"] == 4000
    assert row["pos_left"] == 3 and row["n_left"] == 3
    assert row["pos_right"] == 0 and row["n_right"] == 3
    assert row["gini_micro"] == 0  # pure split


def test_tie_breaks_to_smallest_threshold(ray_session):
    from ocr_service_ray.ops.stump import stump_split

    # all events identical and positive: every threshold scores the
    # same -> smallest threshold wins
    out = stump_split(
        _mk(ray_session, [500000] * 4, ["purchase"] * 4),
        "value", "event_type", "purchase", step=2000, n_thresholds=8,
    )
    assert out[out["is_best"] == 1]["threshold_cents"].iloc[0] == 2000


def test_matches_fraction_brute(ray_session):
    import numpy as np

    from ocr_service_ray.ops.stump import stump_split

    rng = np.random.RandomState(150)
    cents = [int(x) for x in rng.randint(0, 20000, 200)]
    ys = [int(x) for x in rng.rand(200) < (np.array(cents) < 8000) * 0.7]
    labels = ["purchase" if y else "click" for y in ys]
    out = stump_split(
        _mk(ray_session, cents, labels), "value", "event_type", "purchase",
        step=2000, n_thresholds=16,
    )
    bt = _brute_best(cents, ys, 2000, 16)
    assert out[out["is_best"] == 1]["threshold_cents"].iloc[0] == bt
    # counts per threshold agree with direct counting
    for _, r in out.iterrows():
        t = r["threshold_cents"]
        assert r["n_left"] == sum(1 for c in cents if c < t)
        assert r["pos_left"] == sum(y for c, y in zip(cents, ys) if c < t)


def test_gini_micro_monotone_quality(ray_session):
    from ocr_service_ray.ops.stump import stump_split

    # the pure split must have strictly smaller impurity than the
    # all-left degenerate split
    cents = [100, 200, 300, 11000, 12000, 13000]
    labels = ["purchase"] * 3 + ["click"] * 3
    out = stump_split(
        _mk(ray_session, cents, labels), "value", "event_type", "purchase",
        step=2000, n_thresholds=8,
    ).set_index("threshold_cents")
    assert out.loc[2000, "gini_micro"] == 0
    assert out.loc[16000, "gini_micro"] == 500_000  # 50/50 unsplit
