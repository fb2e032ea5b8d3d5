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


def grouped_rate_ztest(
    ds, group_col: str, flag_col: str, scale: int = 1_000_000
) -> "pd.DataFrame":
    """Per-group two-proportion z-test of a 0/1 flag's rate vs the
    REST of the corpus — the slice-regression detector (is this
    source's pass-rate significantly off?). Sqrt-free: reports the
    SIGNED SQUARED z statistic in exact ppm (z^2 ~ chi^2(1); |z|>2
    <=> z2_ppm > 4e6), pooled-variance form with every term an
    integer:

        z2 = (k1*n2 - k2*n1)^2 * N / (n1 * n2 * K * (N-K))

    with (n1, k1) the group's trials/successes, (n2, k2) = rest,
    N = n1+n2, K = k1+k2. Python bigints keep it exact at any scale
    (the DuckDB oracle's HUGEINT caps at ~1.7e38 — fine to ~1e8 rows;
    this side has no cap).

    Distribution: ONE combiner aggregate collapses raw rows to
    per-group (n, k); the close is group-cardinality-bounded driver
    arithmetic. Degenerate corpora (K == 0 or K == N: the flag never
    varies) emit z2_ppm = 0 for every group; a group that IS the whole
    corpus (n2 == 0) drops out."""
    import pandas as pd

    per_g = grouped_agg(
        ds.select_columns([group_col, flag_col]),
        [group_col],
        {"n": (None, "count"), "k": (flag_col, "sum")},
    ).to_pandas()
    N = int(per_g["n"].sum())
    K = int(per_g["k"].sum())
    rows = []
    for _, r in per_g.iterrows():
        n1, k1 = int(r["n"]), int(r["k"])
        n2, k2 = N - n1, K - k1
        if n2 == 0:
            continue
        if K == 0 or K == N:
            z2 = 0
        else:
            num = k1 * n2 - k2 * n1
            z2 = (scale * num * num * N) // (n1 * n2 * K * (N - K))
            if num < 0:
                z2 = -z2
        rows.append(
            {group_col: r[group_col], "n_docs": n1, "n_pass": k1, "z2_ppm": z2}
        )
    out = pd.DataFrame(rows, columns=[group_col, "n_docs", "n_pass", "z2_ppm"])
    for c in ("n_docs", "n_pass", "z2_ppm"):
        out[c] = out[c].astype("int64")
    return out


def hodges_lehmann(ds, col: str):
    """One-sample Hodges-Lehmann location estimator: the lower median
    of all Walsh averages (v_i + v_j) / 2, i <= j, reported as the
    exact rational (hl_num = median pair SUM, hl_den = 2) so no float
    ever forms.

    The 100-TB shape: ``col`` must already be integer-quantized to a
    BOUNDED domain (dollars, cents-bands, deciles — the caller's
    choice of grid IS the estimator's resolution). One value-counts
    combiner (`grouped_agg`) reduces the corpus to |distinct| <= D
    rows; the driver forms the D(D+1)/2 weighted pair sums with
    numpy (D ~ 10^3-10^4 -> <= ~5e7 pairs of int64, still
    driver-sized) and takes the weighted lower median. Row count
    never matters — only the quantized domain size does. Exactly
    SQL-replayable (the oracle cross-joins the same value-counts
    table)."""
    import pandas as pd

    vc = (
        grouped_agg(ds.select_columns([col]), [col], {"n": (None, "count")})
        .to_pandas()
        .sort_values(col)
        .reset_index(drop=True)
    )
    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ("n_pairs", "hl_num", "hl_den")}
    )
    if vc.empty:
        return empty
    v = vc[col].to_numpy().astype(np.int64)
    c = vc["n"].to_numpy().astype(np.int64)
    iu, ju = np.triu_indices(len(v), k=0)
    s = v[iu] + v[ju]
    w = np.where(iu == ju, c[iu] * (c[iu] + 1) // 2, c[iu] * c[ju])
    order = np.argsort(s, kind="stable")
    s, w = s[order], w[order]
    cw = np.cumsum(w)
    m = int(cw[-1])
    idx = int(np.searchsorted(cw, (m + 1) // 2))
    return pd.DataFrame(
        {"n_pairs": [m], "hl_num": [int(s[idx])], "hl_den": [2]}
    ).astype("int64")


def _sm_div(num: int, den: int):
    """Sign-magnitude integer division (truncation toward zero on the
    magnitude) — the repo's cross-engine floor pattern (DuckDB ``//``
    truncates, Python ``//`` floors; this form is identical in both)."""
    if den == 0:
        return None
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den > 0) else -q


def grouped_ols2(ds, group_keys: list[str], x1_col: str, x2_col: str, y_col: str):
    """Per-group TWO-feature least squares via exact integer normal
    equations: ONE combiner scan emits the 9 moments (n, Σx1, Σx2,
    Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y) per group — the only exchange
    — and the 3×3 system closes by Cramer's rule over exact Python
    ints on the |groups|-bounded moment table. Betas are emitted as
    micro-scaled sign-magnitude floors, so the ENTIRE result
    (moments AND solve) is SQL-replayable in HUGEINT — the
    multivariate extension of ``grouped_ols`` (ops/trend.py).
    Inputs must be integers (hour codes, cents, micro units).
    A singular group (collinear features) emits NULL betas."""
    import pandas as pd
    import pyarrow as pa

    from ocr_service_ray.ops.agg import grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        import numpy as np

        x1 = b[x1_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = b[x2_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {k: b[k] for k in group_keys}
        cols.update(
            {
                "x1": pa.array(x1),
                "x2": pa.array(x2),
                "y": pa.array(y),
                "x11": pa.array(x1 * x1),
                "x22": pa.array(x2 * x2),
                "x12": pa.array(x1 * x2),
                "x1y": pa.array(x1 * y),
                "x2y": pa.array(x2 * y),
            }
        )
        return pa.table(cols)

    mom = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        group_keys,
        {
            "n": (None, "count"),
            "sx1": ("x1", "sum"),
            "sx2": ("x2", "sum"),
            "sy": ("y", "sum"),
            "sx11": ("x11", "sum"),
            "sx22": ("x22", "sum"),
            "sx12": ("x12", "sum"),
            "sx1y": ("x1y", "sum"),
            "sx2y": ("x2y", "sum"),
        },
    ).to_pandas()
    b0, b1, b2 = [], [], []
    for _, r in mom.iterrows():
        n, sx1, sx2, sy = int(r["n"]), int(r["sx1"]), int(r["sx2"]), int(r["sy"])
        sx11, sx22, sx12 = int(r["sx11"]), int(r["sx22"]), int(r["sx12"])
        sx1y, sx2y = int(r["sx1y"]), int(r["sx2y"])
        det = (
            n * (sx11 * sx22 - sx12 * sx12)
            - sx1 * (sx1 * sx22 - sx12 * sx2)
            + sx2 * (sx1 * sx12 - sx11 * sx2)
        )
        d0 = (
            sy * (sx11 * sx22 - sx12 * sx12)
            - sx1 * (sx1y * sx22 - sx12 * sx2y)
            + sx2 * (sx1y * sx12 - sx11 * sx2y)
        )
        d1 = (
            n * (sx1y * sx22 - sx12 * sx2y)
            - sy * (sx1 * sx22 - sx12 * sx2)
            + sx2 * (sx1 * sx2y - sx1y * sx2)
        )
        d2 = (
            n * (sx11 * sx2y - sx1y * sx12)
            - sx1 * (sx1 * sx2y - sx1y * sx2)
            + sy * (sx1 * sx12 - sx11 * sx2)
        )
        b0.append(_sm_div(1_000_000 * d0, det))
        b1.append(_sm_div(1_000_000 * d1, det))
        b2.append(_sm_div(1_000_000 * d2, det))
    mom["beta0_micro"] = pd.array(b0, dtype="Int64")
    mom["beta1_micro"] = pd.array(b1, dtype="Int64")
    mom["beta2_micro"] = pd.array(b2, dtype="Int64")
    return mom
