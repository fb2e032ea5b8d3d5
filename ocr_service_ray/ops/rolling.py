"""Per-key rolling z-score anomaly flags — all-integer rule.

The streaming anomaly shape: flag an observation that deviates from
its key's trailing-window mean by more than (k_num/k_den) standard
deviations. Everything stays integer so the result is bit-exact
against a SQL windowed-sum oracle:

    z^2 > k^2  <=>  (n*v - s)^2 * k_den^2 > k_num^2 * (n*q - s^2)

with s = trailing sum, q = trailing sum of squares, n = trailing
count over the PRIOR window (the ``window`` rows strictly before the
current row — include the current row and a lone spike's own
contribution caps z^2 at n-1, hiding exactly the anomalies the op
exists to find), using POPULATION variance. No sqrt, no float
division anywhere.

Overflow contract: |value| <= ~1e6 (cents of ordinary metrics) and
window <= ~1e3 keep every term under 2^63; the caller owns the
scaling (same contract as grouped_outliers / grouped_comoments).

One bucketed key shuffle; the in-group fold is vectorized pandas
rolling sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import bucketed_map_groups


def rolling_zscore_outliers(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    id_col: str,
    window: int = 10,
    k_num: int = 2,
    k_den: int = 1,
    min_n: int = 3,
):
    """Emit (id_col, key_col, val_col, is_outlier) per row; rows with
    fewer than ``min_n`` trailing observations are never flagged
    (variance of a near-empty window is noise)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        v = g[val_col].to_numpy(dtype=np.int64)

        def prior(x: np.ndarray) -> np.ndarray:
            r = pd.Series(x).rolling(window, min_periods=1).sum()
            return r.shift(1, fill_value=0).to_numpy().astype(np.int64)

        s = prior(v)
        q = prior(v * v)
        n = prior(np.ones(len(v), dtype=np.int64))
        lhs = (n * v - s) ** 2 * (k_den * k_den)
        rhs = (k_num * k_num) * (n * q - s * s)
        flag = (lhs > rhs) & (n >= min_n)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                val_col: v,
                "is_outlier": flag.astype(np.int64),
            }
        )

    return bucketed_map_groups(ds, [key_col], fold)
