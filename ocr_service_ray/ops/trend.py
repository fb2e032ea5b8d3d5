"""Trend / time-series analytics — grouped OLS, CUSUM change
detection, time-weighted averages.

All three follow the repo's exact-integer oracle discipline
(__ray_entry__.py module docstring): the data-parallel part reduces to
integer sufficient statistics (one combiner exchange), the final
ratios are exact floor divisions — Python bigints on the driver, the
HUGEINT floor-div identity ``(a - ((a % b) + b) % b) // b`` in the
DuckDB oracle — so results are bit-identical regardless of
association order or summation order.

100-TB shape: raw rows shuffle at most once (the comoments combiner /
the per-key bucket exchange); the driver only ever touches
|groups|-bounded frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_ols(ds, group_keys: list[str], x_col: str, y_col: str, scale: int = 1_000_000) -> pd.DataFrame:
    """Per-group least-squares fit of y on x as exact scaled integers.

    slope_micro  = floor(scale * (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2))
    icept_micro  = floor((scale*Sy - slope_micro*Sx) / n)

    The distributed part is ``grouped_comoments`` (ops/stats.py): six
    integer sums per group, one combiner exchange. The closing
    division runs on the driver over the |groups|-bounded frame in
    Python bigints (n*Sxy*scale overflows int64 long before the
    int64-safe partial sums do). Degenerate groups (all x equal,
    denominator 0) drop out — the oracle filters them identically.

    Caller contract (inherited from grouped_comoments): x and y are
    integer-scaled so ``max|x*y| * rows`` fits int64.
    """
    from .stats import grouped_comoments

    mom = grouped_comoments(ds, group_keys, x_col, y_col).to_pandas()
    rows = []
    for _, r in mom.iterrows():
        n = int(r["n"])
        sx, sy = int(r["sum_x"]), int(r["sum_y"])
        sxx, sxy = int(r["sum_xx"]), int(r["sum_xy"])
        den = n * sxx - sx * sx
        if den == 0:
            continue
        slope = (scale * (n * sxy - sx * sy)) // den
        icept = (scale * sy - slope * sx) // n
        rows.append(
            {
                **{k: r[k] for k in group_keys},
                "n": n,
                "slope_micro": slope,
                "icept_micro": icept,
            }
        )
    if not rows:
        return pd.DataFrame(
            columns=[*group_keys, "n", "slope_micro", "icept_micro"]
        ).astype({"n": "int64", "slope_micro": "int64", "icept_micro": "int64"})
    out = pd.DataFrame(rows)
    return out.astype({"n": "int64", "slope_micro": "int64", "icept_micro": "int64"})


def cusum_peak(ds, key_col: str, ts_col: str = "ts") -> pd.DataFrame:
    """Per-key CUSUM change-point peak over the dense daily grid,
    denominator-free: with D grid days and running count cum_k at the
    k-th day (k = 1..D, zero-filled), the classic CUSUM against the
    key's own mean rate is

        cusum_k = sum_{i<=k}(c_i - total/D)  ==  (D*cum_k - k*total) / D

    so ``scaled_k = D*cum_k - k*total`` ranks identically and stays a
    pure integer. Emits the maximum positive deviation and its
    EARLIEST day — the most likely "rate went up here" change point.

    Built on dense_grid_counts (ops/grid.py): one combiner count +
    one global span agg; the grid fold runs on the driver over the
    |keys| x |days| frame (vocabulary x calendar bounded).
    """
    from .grid import dense_grid_counts

    grid = dense_grid_counts(ds, key_col, ts_col, freq="day")
    if grid.empty:
        return pd.DataFrame(
            columns=[key_col, "n_days", "total", "peak_scaled", "peak_day"]
        )
    n_days = int(grid["period"].nunique())
    rows = []
    for key, g in grid.groupby(key_col, sort=True):
        g = g.sort_values("period", kind="stable")
        n = g["n"].to_numpy(dtype=np.int64)
        total = int(n.sum())
        cum = np.cumsum(n)
        k = np.arange(1, len(n) + 1, dtype=np.int64)
        scaled = n_days * cum - k * total
        best = int(scaled.max())
        peak_day = int(g["period"].to_numpy()[scaled == best].min())
        rows.append(
            {
                key_col: key,
                "n_days": n_days,
                "total": total,
                "peak_scaled": best,
                "peak_day": peak_day,
            }
        )
    return pd.DataFrame(rows).astype(
        {"n_days": "int64", "total": "int64", "peak_scaled": "int64", "peak_day": "int64"}
    )


def time_weighted_avg(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_cols: list[str],
):
    """Per-key time-weighted average — each value weighted by the
    WHOLE SECONDS until the key's next event (step interpolation; the
    last event carries no weight):

        tw = floor( sum(v_i * gap_i) / sum(gap_i) ),
        gap_i = (epoch_us(t_{i+1}) - epoch_us(t_i)) // 1_000_000

    ``value_col`` must be integer-scaled (cents). Whole-second gaps
    keep ``sum(v*gap)`` int64-safe for any horizon (max_v * span_s).
    Keys whose gaps are all sub-second (or with a single event) drop
    out — the SQL mirror filters ``sum(gap) > 0`` identically. Uses
    epoch arithmetic, NOT date_diff('second', ...): date_diff counts
    boundary CROSSINGS, which differs from the floored duration.

    One bucketed exchange (ops/agg.bucketed_map_groups); per-key rows
    must fit a task — the repo-wide sessionize contract.
    """
    from .agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g[value_col].to_numpy().astype(np.int64)
        if len(ts) < 2:
            return pd.DataFrame({key_col: [], "w_seconds": [], "tw_value": []})
        gap = (ts[1:] - ts[:-1]) // 1_000_000
        w = int(gap.sum())
        if w <= 0:
            return pd.DataFrame({key_col: [], "w_seconds": [], "tw_value": []})
        wv = int((v[:-1] * gap).sum())
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "w_seconds": np.array([w], dtype=np.int64),
                "tw_value": np.array([wv // w], dtype=np.int64),
            }
        )

    return bucketed_map_groups(ds, [key_col], fold)


def ewma_grid(
    ds,
    key_col: str,
    ts_col: str = "ts",
    window: int = 8,
    scale: int = 1000,
) -> pd.DataFrame:
    """Per-key geometric-weight moving average of DAILY counts over
    the dense zero-filled grid — the integer-exact EWMA stand-in
    (alpha = 1/2) every ingestion monitor wants:

        S_t        = sum_{j=0..w-1} n_{t-j} * 2^(w-1-j)
        ewma_milli = floor(scale * S_t / (2^w - 1))

    Weights are exact powers of two, so both sides (numpy here, a
    banded self-join in the DuckDB oracle) compute the SAME integer —
    no float pow drift. Days before the observed span contribute 0
    (the grid zero-fills only inside [min_day, max_day]).

    Distribution: the raw rows shuffle once inside
    ``dense_grid_counts``'s combiner aggregate; the convolution runs
    on the |keys| x |days| driver grid (vocabulary x calendar bounded
    — grid.py's documented contract)."""
    from .grid import dense_grid_counts

    grid = dense_grid_counts(ds, key_col, ts_col, freq="day")
    if grid.empty:
        return pd.DataFrame(
            {key_col: [], "day": [], "n": [], "ewma_milli": []}
        )
    den = (1 << window) - 1
    outs = []
    for key, g in grid.groupby(key_col, sort=False):
        g = g.sort_values("period", kind="stable")
        n = g["n"].to_numpy(dtype=np.int64)
        s = np.zeros(len(n), dtype=np.int64)
        for j in range(window):
            w = np.int64(1 << (window - 1 - j))
            if j == 0:
                s += n * w
            else:
                s[j:] += n[:-j] * w
        outs.append(
            pd.DataFrame(
                {
                    key_col: g[key_col].to_numpy(),
                    "day": g["period"].to_numpy(),
                    "n": n,
                    "ewma_milli": (scale * s) // den,
                }
            )
        )
    return pd.concat(outs, ignore_index=True)


def lag1_autocorr(
    ds,
    key_col: str,
    ts_col: str = "ts",
    scale: int = 1_000_000,
) -> pd.DataFrame:
    """Per-key lag-1 autocorrelation of daily counts on the dense
    grid, as an exact SIGNED SQUARED correlation in ppm (sqrt is
    transcendental; r^2 with r's sign is floor-divisible):

        pairs (x, y) = (n_d, n_{d+1})   for consecutive grid days
        num  = n*Sxy - Sx*Sy
        denx = n*Sxx - Sx^2,  deny = n*Syy - Sy^2
        acorr2_ppm = sign(num) * floor(scale * num^2 / (denx*deny))

    Keys with a constant series (denx*deny == 0) drop out — the SQL
    mirror filters identically. Python bigints: num^2 exceeds int64
    at scale (HUGEINT in the oracle)."""
    from .grid import dense_grid_counts

    grid = dense_grid_counts(ds, key_col, ts_col, freq="day")
    rows = []
    for key, g in grid.groupby(key_col, sort=False):
        g = g.sort_values("period", kind="stable")
        vals = [int(v) for v in g["n"].to_numpy()]
        if len(vals) < 2:
            continue
        xs, ys = vals[:-1], vals[1:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        if den == 0:
            continue
        mag = (scale * num * num) // den
        rows.append(
            {
                key_col: key,
                "n_pairs": n,
                "acorr2_ppm": mag if num >= 0 else -mag,
            }
        )
    if not rows:
        return pd.DataFrame({key_col: [], "n_pairs": [], "acorr2_ppm": []})
    return pd.DataFrame(rows).astype({"n_pairs": "int64", "acorr2_ppm": "int64"})


def fano_grid(ds, key_col: str, ts_col: str = "ts", scale: int = 1_000_000):
    """Per-key burstiness (Fano factor — variance-to-mean ratio) of
    DAILY counts on the dense zero-filled grid, exact ppm (1e6 =
    Poisson-like, above = bursty, below = regular):

        F = var_pop / mean = (n*Sxx - Sx^2) / (n * Sx)
        fano_ppm = floor( scale * (n*Sxx - Sx^2) / (n * Sx) )

    with n = grid days, Sx / Sxx the count sums — all integers, one
    closing floor division (numerator >= 0 by Cauchy–Schwarz).

    Distribution: raw rows shuffle once inside ``dense_grid_counts``'s
    combiner; the moment fold runs on the |keys| x |days| driver grid
    (vocabulary x calendar bounded). Every emitted key has Sx > 0 (a
    key exists only with >= 1 event).

    Returns a DataFrame (key, n_days, n_rows, fano_ppm)."""
    from .grid import dense_grid_counts

    grid = dense_grid_counts(ds, key_col, ts_col, freq="day")
    if grid.empty:
        return pd.DataFrame({key_col: [], "n_days": [], "n_rows": [], "fano_ppm": []})
    rows = []
    for key, g in grid.groupby(key_col, sort=False):
        x = [int(v) for v in g["n"]]
        n = len(x)
        sx = sum(x)
        sxx = sum(v * v for v in x)
        rows.append(
            {
                key_col: key,
                "n_days": n,
                "n_rows": sx,
                "fano_ppm": (scale * (n * sxx - sx * sx)) // (n * sx),
            }
        )
    return pd.DataFrame(rows).astype(
        {"n_days": "int64", "n_rows": "int64", "fano_ppm": "int64"}
    )


def rolling_window_corr(
    ds,
    key_col: str,
    key_a,
    key_b,
    ts_col: str = "ts",
    window: int = 7,
    scale: int = 1_000_000,
):
    """Rolling windowed correlation between two keys' DAILY count
    series on the shared dense grid — "do views and purchases move
    together this week?" — as an exact SIGNED SQUARED correlation in
    ppm per day (same sqrt-free discipline as lag1_autocorr):

        window  = the ``window`` grid days ending at d (shorter at
                  the span head)
        num     = n*Sxy - Sx*Sy ;  den = (n*Sxx - Sx^2)(n*Syy - Sy^2)
        rcorr2_ppm = sign(num) * floor(scale * num^2 / den)

    Days whose window has a constant series on either side (den == 0)
    are emitted with rcorr2_ppm NULL-free as 0 — a flat week has no
    co-movement signal, and keeping the row keeps the day axis dense.

    Distribution: raw rows shuffle once inside ``dense_grid_counts``;
    the windowed fold runs on the 2 x |days| driver grid (calendar
    bounded). Returns a DataFrame (day, n_a, n_b, rcorr2_ppm)."""
    import pyarrow.compute as pc

    from .grid import dense_grid_counts

    two = ds.map_batches(
        lambda b: b.filter(
            pc.or_(pc.equal(b[key_col], key_a), pc.equal(b[key_col], key_b))
        ),
        batch_format="pyarrow",
    )
    grid = dense_grid_counts(two, key_col, ts_col, freq="day")
    if grid.empty:
        return pd.DataFrame({"day": [], "n_a": [], "n_b": [], "rcorr2_ppm": []})
    pivot = (
        grid.pivot_table(index="period", columns=key_col, values="n", fill_value=0)
        .sort_index()
    )
    days = [int(v) for v in pivot.index]
    xa = [int(v) for v in pivot.get(key_a, pd.Series(0, index=pivot.index))]
    xb = [int(v) for v in pivot.get(key_b, pd.Series(0, index=pivot.index))]
    rows = []
    for i, d in enumerate(days):
        lo = max(0, i - window + 1)
        ax, bx = xa[lo : i + 1], xb[lo : i + 1]
        n = len(ax)
        sx, sy = sum(ax), sum(bx)
        sxx = sum(v * v for v in ax)
        syy = sum(v * v for v in bx)
        sxy = sum(u * v for u, v in zip(ax, bx))
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        if den == 0:
            r2 = 0
        else:
            r2 = (scale * num * num) // den
            if num < 0:
                r2 = -r2
        rows.append({"day": d, "n_a": xa[i], "n_b": xb[i], "rcorr2_ppm": r2})
    return pd.DataFrame(rows).astype(
        {"day": "int64", "n_a": "int64", "n_b": "int64", "rcorr2_ppm": "int64"}
    )


def seasonal_outliers(
    ds,
    key_col: str,
    ts_col: str = "ts",
    factor_num: int = 2,
    factor_den: int = 1,
):
    """Days whose count exceeds ``factor`` x their key's SAME-WEEKDAY
    average — the seasonality-adjusted spike detector (a busy Monday
    is judged against Mondays, not the whole week). Weekday is
    epoch_day mod 7 (integer, calendar-convention-free), the average
    compare cross-multiplies so everything stays integer:

        flag(d)  <=>  n_d * n_days(key, dow) * factor_den
                      >  factor_num * total(key, dow) * 1

    computed over the DENSE grid (zero days pull the weekday average
    down, exactly as a monitor wants).

    Distribution: one combiner inside ``dense_grid_counts``; the
    close runs on the |keys| x |days| driver grid. Returns a
    DataFrame (key, day, n, dow_days, dow_total) of flagged days."""
    from .grid import dense_grid_counts

    grid = dense_grid_counts(ds, key_col, ts_col, freq="day")
    if grid.empty:
        return pd.DataFrame(
            {key_col: [], "day": [], "n": [], "dow_days": [], "dow_total": []}
        )
    grid = grid.copy()
    grid["dow"] = grid["period"].astype("int64") % 7
    rows = []
    for (key, dow), g in grid.groupby([key_col, "dow"], sort=False):
        nd = len(g)
        tot = int(g["n"].sum())
        for _, r in g.iterrows():
            n = int(r["n"])
            if n * nd * factor_den > factor_num * tot:
                rows.append(
                    {
                        key_col: key,
                        "day": int(r["period"]),
                        "n": n,
                        "dow_days": nd,
                        "dow_total": tot,
                    }
                )
    out = pd.DataFrame(
        rows, columns=[key_col, "day", "n", "dow_days", "dow_total"]
    )
    for c in ("day", "n", "dow_days", "dow_total"):
        out[c] = out[c].astype("int64") if len(out) else out[c]
    return out


def leadlag_corr(
    ds,
    key_col: str,
    key_a,
    key_b,
    max_lag: int = 3,
    ts_col: str = "ts",
    scale: int = 1_000_000,
):
    """Lead–lag cross-correlation between two keys' daily count
    series: for each lag L in 0..max_lag, the exact signed-squared
    correlation (ppm) of (a[t], b[t+L]) over the overlapping grid —
    "purchases follow views by how many days?". Same integer-moment
    discipline as lag1_autocorr; lags whose overlap is constant on
    either side (den == 0) emit 0.

    Distribution: one combiner inside ``dense_grid_counts``; the lag
    scan runs on the 2 x |days| driver grid. Returns a DataFrame
    (lag, n_pairs, xcorr2_ppm)."""
    import pyarrow.compute as pc

    from .grid import dense_grid_counts

    two = ds.map_batches(
        lambda b: b.filter(
            pc.or_(pc.equal(b[key_col], key_a), pc.equal(b[key_col], key_b))
        ),
        batch_format="pyarrow",
    )
    grid = dense_grid_counts(two, key_col, ts_col, freq="day")
    if grid.empty:
        return pd.DataFrame({"lag": [], "n_pairs": [], "xcorr2_ppm": []})
    pivot = (
        grid.pivot_table(index="period", columns=key_col, values="n", fill_value=0)
        .sort_index()
    )
    xa = [int(v) for v in pivot.get(key_a, pd.Series(0, index=pivot.index))]
    xb = [int(v) for v in pivot.get(key_b, pd.Series(0, index=pivot.index))]
    rows = []
    for lag in range(max_lag + 1):
        ax = xa[: len(xa) - lag] if lag else xa
        bx = xb[lag:]
        n = len(ax)
        if n == 0:
            rows.append({"lag": lag, "n_pairs": 0, "xcorr2_ppm": 0})
            continue
        sx, sy = sum(ax), sum(bx)
        sxx = sum(v * v for v in ax)
        syy = sum(v * v for v in bx)
        sxy = sum(u * v for u, v in zip(ax, bx))
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        if den == 0:
            r2 = 0
        else:
            r2 = (scale * num * num) // den
            if num < 0:
                r2 = -r2
        rows.append({"lag": lag, "n_pairs": n, "xcorr2_ppm": r2})
    return pd.DataFrame(rows).astype(
        {"lag": "int64", "n_pairs": "int64", "xcorr2_ppm": "int64"}
    )
