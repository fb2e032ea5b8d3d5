"""Grouped bivariate moment sums — the distributed sufficient
statistics for covariance / correlation / OLS slope.

Correlation itself needs sqrt + division (not exactly
SQL-comparable), but its *sufficient statistics* are pure integer
sums when x and y are integer-scaled: per group emit

    n, sum_x, sum_y, sum_xx, sum_yy, sum_xy

Any consumer (corr, covar_pop, regr_slope, z-scoring) derives its
float from these six numbers on the driver; the heavy data-parallel
part is one combiner aggregate — partials fold inside map_batches,
the shuffle moves |groups| x 6 integers, raw rows never move. This is
the same integer-moments discipline as ``grouped_outliers``
(ops/agg.py) extended to two variables.

Caller contract: pick x/y scales so ``max|x*y| * rows`` fits int64
(document per call site); the op itself does not rescale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .agg import grouped_agg


def grouped_comoments(ds, group_keys: list[str], x_col: str, y_col: str):
    """Per-group integer moment sums for (x_col, y_col).

    Input columns must already be integer-valued (micro-scaled by the
    caller). NULL in either column drops the row (SQL corr/covar
    pairwise-deletion semantics).
    """

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        valid = pc.and_(pc.is_valid(b[x_col]), pc.is_valid(b[y_col]))
        b = b.filter(valid)
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {k: b[k] for k in group_keys}
        cols.update(
            {
                "_x": pa.array(x),
                "_y": pa.array(y),
                "_xx": pa.array(x * x),
                "_yy": pa.array(y * y),
                "_xy": pa.array(x * y),
            }
        )
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_agg(
        prepped,
        group_keys,
        {
            "n": (None, "count"),
            "sum_x": ("_x", "sum"),
            "sum_y": ("_y", "sum"),
            "sum_xx": ("_xx", "sum"),
            "sum_yy": ("_yy", "sum"),
            "sum_xy": ("_xy", "sum"),
        },
    )
