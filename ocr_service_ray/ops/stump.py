"""Decision stump — the exact best single threshold split by Gini
impurity (Breiman et al. 1984, CART's base learner): evaluate every
candidate threshold on a fixed cents grid and pick the split
minimizing weighted Gini. All comparisons are exact rationals
(cross-multiplied integers) — no float impurity, so argmin and ties
are bit-reproducible and the oracle replays them in HUGEINT.

Contract (threshold grid fixed by the caller):
  cents      = floor(value*100 + 0.5)   (repo floor-cents rule)
  t_k        = step*(k+1), k = 0..n_thresholds-1; left = cents < t_k
  score(t)   = sum_side (pos^2 + neg^2)/n_side   (0 for empty side)
  best       = max score, ties -> smallest t
  gini_micro = (10^6*(n*D - N)) // (n*D) where score = N/D —
               the normalized weighted impurity in micro units.

100-TB shape: ONE scan folds to per-bucket (n, pos) partials (the
value histogram combiner); thresholds, cumulative counts and the
exact argmin close on the |buckets|-bounded table."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa


def _term(p: int, n: int) -> Fraction:
    if n == 0:
        return Fraction(0)
    return Fraction(p * p + (n - p) * (n - p), n)


def stump_split(
    ds,
    value_col: str,
    label_col: str,
    positive: str,
    step: int = 2000,
    n_thresholds: int = 64,
) -> pd.DataFrame:
    """Best Gini stump of ``positive``-class membership on the
    floor-cents of ``value_col``. Returns one row per threshold:
    ``(threshold_cents, n_left, pos_left, n_right, pos_right,
    gini_micro, is_best)``."""
    from ocr_service_ray.ops.agg import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        bucket = cents // step
        y = (
            np.asarray(b[label_col].to_pylist()) == positive
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "n": pa.array(np.ones(len(b), np.int64)),
                "pos": pa.array(y),
            }
        )

    hist = (
        grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["bucket"],
            {"n": ("n", "sum"), "pos": ("pos", "sum")},
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    n_tot = int(hist["n"].sum())
    p_tot = int(hist["pos"].sum())
    rows = []
    best_k, best_score = None, None
    for k in range(n_thresholds):
        left = hist[hist["bucket"] <= k]
        nl, pl = int(left["n"].sum()), int(left["pos"].sum())
        nr, pr = n_tot - nl, p_tot - pl
        score = _term(pl, nl) + _term(pr, nr)
        D = max(nl, 1) * max(nr, 1)
        N = (0 if nl == 0 else (pl * pl + (nl - pl) * (nl - pl)) * max(nr, 1)) + (
            0 if nr == 0 else (pr * pr + (nr - pr) * (nr - pr)) * max(nl, 1)
        )
        micro = (1_000_000 * (n_tot * D - N)) // (n_tot * D) if n_tot else 0
        rows.append((step * (k + 1), nl, pl, nr, pr, micro))
        if best_score is None or score > best_score:
            best_k, best_score = k, score
    out = pd.DataFrame(
        rows,
        columns=[
            "threshold_cents",
            "n_left",
            "pos_left",
            "n_right",
            "pos_right",
            "gini_micro",
        ],
    ).astype("int64")
    out["is_best"] = (out.index == best_k).astype("int64")
    return out
