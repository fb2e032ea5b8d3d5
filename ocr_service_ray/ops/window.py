"""Per-key ordered window functions — lag deltas and rolling frames.

The SQL shapes::

    LAG(x) OVER (PARTITION BY key ORDER BY ...)
    SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN n-1
                 PRECEDING AND CURRENT ROW)

Ray Data has no window operator; both are expressed as ONE
coarse-bucket key shuffle (ops/agg.bucketed_map_groups — all rows of a
key land in one task) followed by a vectorized in-group sort + numpy /
pandas fold. Rows of one key must fit a task — the same
per-key-boundedness assumption as ``sessionize`` / ``cumulative_by_key``
(relational.py); salt a dominating key upstream.

100-TB shape: the exchange moves each row exactly once, keyed by an
element-pure hash (ops/hashing.py); no global sort, no driver
materialization. Sums should be INTEGER (cents/micro — the repo-wide
oracle discipline) so the rolling total is association-order-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_lag_delta(
    ds,
    key_col: str,
    order_cols: list[str],
    ts_col: str,
    out_col: str = "delta_us",
):
    """Per-key inter-arrival delta: for each row, ``ts - lag(ts)`` in
    integer MICROSECONDS over the key's rows ordered by
    ``order_cols`` (which must be unique per key for determinism).
    The first row of each key gets NULL — exactly SQL's
    ``epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY key ORDER
    BY ...)``. ``ts_col`` may be a timestamp or any integer column
    (then the delta is in its native unit)."""
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        ts = g[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            ts_i = ts.astype("datetime64[us]").astype(np.int64)
        else:
            ts_i = ts.astype(np.int64)
        delta = np.empty(len(ts_i), dtype=np.int64)
        delta[1:] = ts_i[1:] - ts_i[:-1]
        out = g.copy()
        # nullable Int64: the first row per key is SQL-NULL, not 0
        vals = pd.array(delta, dtype="Int64")
        if len(vals):
            vals[0] = pd.NA
        out[out_col] = vals
        return out

    return bucketed_map_groups(ds, [key_col], fold)


def grouped_moving_sum(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_col: str = "moving_sum",
):
    """Per-key trailing-``window``-row sum ordered by ``order_cols``
    — ``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``. Rows before a full frame
    sum what exists (SQL frame semantics). ``value_col`` should be an
    integer (cents/micro) column; the result is exact int64."""
    from ocr_service_ray.ops.agg import _column_type, bucketed_map_groups

    if window < 1:
        raise ValueError("window must be >= 1")
    ctype = _column_type(ds, value_col)
    if ctype is not None and not pa.types.is_integer(ctype):
        raise ValueError(
            f"grouped_moving_sum sums integers (cents/micro); {value_col} is {ctype}"
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        v = g[value_col].to_numpy().astype(np.int64)
        cum = np.cumsum(v)
        roll = cum.copy()
        if len(v) > window:
            roll[window:] = cum[window:] - cum[:-window]
        out = g.copy()
        out[out_col] = roll
        return out

    return bucketed_map_groups(ds, [key_col], fold)


def grouped_range_sum(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    range_us: int,
    out_col: str = "range_sum",
):
    """Per-key time-RANGE frame sum — ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN <range> PRECEDING AND CURRENT ROW)``:
    each row sums every row of its key whose timestamp lies in
    ``[ts - range_us, ts]``, INCLUDING equal-timestamp peers after it
    (SQL RANGE frames end at the last peer). One bucketed key shuffle,
    then an in-group sort + prefix-sum + two vectorized searchsorted
    calls — O(n log n) per key, no per-row Python. The result depends
    only on the timestamp SET, so no tiebreak column is needed; sums
    should be integer (cents/micro) for cross-engine exactness."""
    from ocr_service_ray.ops.agg import _column_type, bucketed_map_groups

    ctype = _column_type(ds, value_col)
    if ctype is not None and not pa.types.is_integer(ctype):
        raise ValueError(
            f"grouped_range_sum sums integers (cents/micro); {value_col} is {ctype}"
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            ts_i = ts.astype("datetime64[us]").astype(np.int64)
        else:
            ts_i = ts.astype(np.int64)
        v = g[value_col].to_numpy().astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(v)))
        lo = np.searchsorted(ts_i, ts_i - range_us, side="left")
        hi = np.searchsorted(ts_i, ts_i, side="right")
        out = g.copy()
        out[out_col] = cum[hi] - cum[lo]
        return out

    return bucketed_map_groups(ds, [key_col], fold)


def grouped_dense_rank(
    ds,
    key_col: str,
    value_cols: list[str],
    out_col: str = "dense_rank",
):
    """Per-key ``DENSE_RANK() OVER (PARTITION BY key ORDER BY
    value_cols)`` — equal value tuples share a rank, ranks are gapless
    starting at 1. One bucketed key shuffle + an in-group sort and a
    vectorized distinct-boundary cumsum; deterministic without a
    tiebreak column (ties share the rank by definition)."""
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_cols, kind="stable")
        vals = g[value_cols]
        # boundary where ANY order column changes vs the previous row;
        # two NULLs compare equal (SQL ORDER BY groups NULLs together)
        prev = vals.shift()
        changed = (
            ((vals != prev) & ~(vals.isna() & prev.isna())).any(axis=1).to_numpy()
        )
        changed[0] = True
        out = g.copy()
        out[out_col] = np.cumsum(changed).astype(np.int64)
        return out

    return bucketed_map_groups(ds, [key_col], fold)


def attribution_pairs(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    window_us: int,
):
    """Attribution-window pair counting — for every ``to_type`` event,
    how many ``from_type`` events the same key produced in the
    preceding ``window_us`` microseconds (strictly before, window
    inclusive): the SQL inequality self-join

        FROM a JOIN b ON a.key = b.key AND a.type = from AND
        b.type = to AND b.ts - a.ts BETWEEN 1 AND window

    without materializing the pair table: one bucketed key shuffle,
    then per key a sort + two vectorized ``searchsorted`` calls count
    each target's qualifying sources in O(n log n) — the pair count is
    derived, pairs never exist as rows. Ties (equal ts) do NOT
    attribute (strictly-before, matching the funnel's strictly-after
    rule).

    Output: one row per ``to_type`` event — ALL its input columns plus
    ``n_attributed`` (int64); rows of other types drop.
    """
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.astype("datetime64[us]").astype(np.int64)
        else:
            ts = ts.astype(np.int64)
        types = g[type_col].to_numpy()
        src = np.sort(ts[types == from_type])
        tgt_mask = types == to_type
        if not tgt_mask.any():
            return None
        tgt = ts[tgt_mask]
        lo = np.searchsorted(src, tgt - window_us, side="left")
        hi = np.searchsorted(src, tgt, side="left")  # strictly before
        out = g.loc[tgt_mask].copy()
        out["n_attributed"] = (hi - lo).astype(np.int64)
        return out

    return bucketed_map_groups(ds, [key_col], fold)


def transition_counts(
    ds,
    key_col: str,
    order_cols: list[str],
    type_col: str,
):
    """Behavioral transition matrix — counts of consecutive
    ``(prev_type, next_type)`` pairs within each key's ordered event
    stream (the Markov-chain / next-action-model input): the SQL
    ``lag() OVER (PARTITION BY key ORDER BY ...)`` + GROUP BY shape.
    One bucketed key shuffle; each key folds to its |types|^2-bounded
    local counts (the combiner), then one tiny grouped merge. The
    first event of a key has no predecessor and contributes nothing.

    Output: ``{prev, next, n}`` (int64).
    """
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        t = g[type_col].to_numpy()
        if len(t) < 2:
            return None
        return (
            pd.DataFrame({"prev": t[:-1], "next": t[1:]})
            .groupby(["prev", "next"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    local = bucketed_map_groups(ds, [key_col], fold)
    return grouped_agg(local, ["prev", "next"], {"n": ("n", "sum")})


def cume_dist_micro(
    ds,
    key_col: str,
    val_col: str,
    id_col: str,
    scale: int = 1_000_000,
):
    """Per-key cumulative distribution of each row's value as an
    integer fraction: cume_ppm = (# peers with value <= v) * scale //
    n — CUME_DIST() without the float division (a/b*1e6 in doubles
    rounds differently than the exact a*1e6//b). One bucketed key
    shuffle; in-group work is one sort + searchsorted."""
    import numpy as np
    import pandas as pd

    from .agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        v = g[val_col].to_numpy()
        sv = np.sort(v, kind="mergesort")
        cnt_le = np.searchsorted(sv, v, side="right").astype(np.int64)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "cume_micro": cnt_le * scale // len(v),
            }
        )

    return bucketed_map_groups(ds, [key_col], fold)


def grouped_ntile_agg(
    ds,
    group_col: str,
    value_col: str,
    n_tiles: int = 4,
    agg_specs: dict | None = None,
):
    """SQL ``NTILE(k) OVER (PARTITION BY g ORDER BY v, tiebreak)``
    folded to per-(group, tile) aggregates — the quartile-bucket
    revenue report without per-row output. NTILE semantics are
    mirrored exactly: with n rows, the first ``n % k`` tiles hold
    ``n//k + 1`` rows, ordered by (value, input order); since only
    AGGREGATES of tiles leave the fold, value ties make the per-tile
    sums permutation-invariant ONLY if the caller's sort key is
    unique per row — pass a pre-sorted unique composite via
    ``value_col`` being a tuple-like list of columns.

    One bucketed group shuffle; the in-group fold sorts and slices.
    ``agg_specs``: {out: (col, 'sum'|'count'|'min'|'max')}; default
    counts rows. Returns a Dataset (group, tile, *aggs)."""
    from ocr_service_ray.ops.agg import bucketed_map_groups

    value_cols = value_col if isinstance(value_col, list) else [value_col]
    agg_specs = agg_specs or {"n_rows": (None, "count")}

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_cols, kind="mergesort").reset_index(drop=True)
        n = len(g)
        k = n_tiles
        big = n % k
        size_small = n // k
        rows = []
        pos = 0
        for tile in range(1, k + 1):
            size = size_small + (1 if tile <= big else 0)
            if size == 0:
                continue
            sub = g.iloc[pos : pos + size]
            pos += size
            row = {group_col: g[group_col].iloc[0], "tile": tile}
            for out, (col, how) in agg_specs.items():
                if how == "count":
                    row[out] = len(sub)
                elif how == "sum":
                    row[out] = int(sub[col].sum())
                elif how == "min":
                    row[out] = sub[col].min()
                elif how == "max":
                    row[out] = sub[col].max()
                else:
                    raise ValueError(how)
            rows.append(row)
        out = pd.DataFrame(rows)
        out["tile"] = out["tile"].astype("int64")
        return out

    return bucketed_map_groups(
        ds.select_columns(
            [group_col] + [c for c in value_cols if c != group_col]
        ),
        [group_col],
        fold,
    )
