"""Interval primitives: session-interval extraction and a banded
large-large interval overlap join.

``interval_overlap_join`` is the temporal theta-join Ray Data has no
native operator for: all pairs (L, R) with [L.s, L.e] ∩ [R.s, R.e]
non-empty (closed intervals). The scalable plan is time banding:

1. each interval explodes to the coarse time cells it touches
   (bounded by ceil(length / band) + 1 — pick ``band`` at the
   typical interval length so most intervals hit 1-2 cells);
2. one hash-partitioned equi-join per cell key pairs only
   temporally-near intervals — the all-to-all becomes |cell|-local;
3. the exact overlap predicate filters the candidates, and a pair
   that shares several cells is kept only in its canonical cell
   (floor(max(s_l, s_r) / band)), so output pairs are exact and
   unique with no post-dedup exchange.

Skew note: a cell containing k_l x k_r intervals produces that many
candidates; for hot cells (flash events), shrink ``band`` or salt
the cell key by a secondary hash — the canonical-cell rule keeps
correctness under any banding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import bucketed_map_groups
from .relational import hash_join


def session_intervals(
    events_ds,
    gap_us: int = 30 * 60 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """(user_id, session_id, s_us, e_us) — sessions split on gaps
    strictly greater than ``gap_us``; timestamps as integer epoch-µs
    (closed intervals, single-event sessions have s == e). One
    user-keyed shuffle, vectorized in-group fold."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(pd.DatetimeIndex(g[ts_col]).values.astype("datetime64[us]").astype(np.int64))
        brk = np.zeros(len(ts), dtype=np.int64)
        brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        df = pd.DataFrame({"session_id": sid, "ts": ts})
        agg = df.groupby("session_id")["ts"].agg(["min", "max"]).reset_index()
        return pd.DataFrame(
            {
                user_col: g[user_col].iloc[0],
                "session_id": agg["session_id"].to_numpy(),
                "s_us": agg["min"].to_numpy(),
                "e_us": agg["max"].to_numpy(),
            }
        )

    return bucketed_map_groups(events_ds, [user_col], fold)


def _explode_cells(ds, cols: list[str], start: str, end: str, band: int, prefix: str):
    def f(b: pa.Table) -> pa.Table:
        s = b[start].to_numpy(zero_copy_only=False)
        e = b[end].to_numpy(zero_copy_only=False)
        c0 = s // band
        c1 = e // band
        reps = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        # per-row running cell offset
        offsets = np.arange(reps.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        cells = c0[idx] + offsets
        out = {f"{prefix}{c}": b[c].take(pa.array(idx)) for c in cols}
        out[f"{prefix}s"] = pa.array(s[idx])
        out[f"{prefix}e"] = pa.array(e[idx])
        out["cell"] = pa.array(cells.astype(np.int64))
        return pa.table(out)

    # strip-and-repartition: upstream map_groups blocks may be
    # schema-less zero-row partitions the hash join rejects
    return ds.map_batches(f, batch_format="pyarrow").repartition(4)


def interval_overlap_join(
    left_ds,
    right_ds,
    left_cols: list[str],
    right_cols: list[str],
    start_col: str = "s_us",
    end_col: str = "e_us",
    band: int = 6 * 3600 * 1_000_000,
):
    """Exact unique overlap pairs between two interval Datasets.

    Emits one row per overlapping pair: left id columns prefixed
    ``l_``, right prefixed ``r_``, no duplicates. Output size equals
    the true overlap count — downstream should aggregate rather than
    materialize when that count is large.
    """
    lc = _explode_cells(left_ds, left_cols, start_col, end_col, band, "l_")
    rc = _explode_cells(right_ds, right_cols, start_col, end_col, band, "r_")
    joined = hash_join(lc, rc, on="cell")

    def keep(b: pa.Table) -> pa.Table:
        ls = b["l_s"].to_numpy(zero_copy_only=False)
        le = b["l_e"].to_numpy(zero_copy_only=False)
        rs = b["r_s"].to_numpy(zero_copy_only=False)
        re_ = b["r_e"].to_numpy(zero_copy_only=False)
        cell = b["cell"].to_numpy(zero_copy_only=False)
        overlap = (ls <= re_) & (rs <= le)
        canonical = cell == (np.maximum(ls, rs) // band)
        return b.filter(pa.array(overlap & canonical)).drop_columns(["cell"])

    return joined.map_batches(keep, batch_format="pyarrow")


def peak_concurrency(intervals_ds, s_col: str = "s_us", e_col: str = "e_us"):
    """Maximum number of simultaneously-open CLOSED intervals — the
    sweep-line classic (peak concurrent sessions / connections /
    jobs), fully distributed:

    1. each interval emits +1 at its start and -1 just after its end,
       keyed ``k = 2*t + kind`` (kind 0 = start, 1 = end) so starts
       apply BEFORE ends at the same timestamp (closed-interval
       overlap) and boundary keys are unique after one combiner
       merge;
    2. one distributed sort by k + the two-phase exclusive
       ``prefix_sum`` (ops/scan.py — block metadata only crosses the
       driver) make the running concurrency ``offset + delta`` per
       boundary row;
    3. a global max closes.

    Returns {"n_intervals": int, "peak_concurrent": int}."""
    from ocr_service_ray.ops.agg import global_agg, grouped_agg
    from ocr_service_ray.ops.scan import prefix_sum

    n_intervals = intervals_ds.count()
    if n_intervals == 0:
        return {"n_intervals": 0, "peak_concurrent": 0}

    def boundaries(b: pa.Table) -> pa.Table:
        s = b[s_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = b[e_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.concatenate([s * 2, e * 2 + 1])
        d = np.concatenate(
            [np.ones(len(s), dtype=np.int64), -np.ones(len(e), dtype=np.int64)]
        )
        return pa.table({"k": pa.array(k), "d": pa.array(d)})

    agg = grouped_agg(
        intervals_ds.map_batches(boundaries, batch_format="pyarrow"),
        ["k"],
        {"d": ("d", "sum")},
    )
    scanned = prefix_sum(agg.sort("k"), "k", "d", out_col="offset")

    def inclusive(b: pa.Table) -> pa.Table:
        run = (
            b["offset"].to_numpy(zero_copy_only=False)
            + b["d"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"conc": pa.array(run)})

    peak = global_agg(
        scanned.map_batches(inclusive, batch_format="pyarrow"),
        {"peak": ("conc", "max")},
    )
    return {"n_intervals": int(n_intervals), "peak_concurrent": int(peak["peak"])}


def weighted_interval_max(
    ds,
    key_col: str,
    s_col: str,
    f_col: str,
    v_col: str,
    tie_col: str,
):
    """Weighted interval scheduling per key — the classic DP (Kleinberg
    & Tardos §6.1): among each key's intervals pick a non-overlapping
    subset maximizing total value; dp[i] = max(dp[i-1], v_i + dp[p(i)])
    over intervals sorted by finish, with p(i) the latest interval
    finishing ≤ start_i (binary search). "Back-to-back" (f_j == s_i)
    counts as compatible.

    100-TB shape: one coarse-bucket shuffle co-locates each key
    (``bucketed_map_groups`` — the sessionize discipline), then the
    in-group DP is a sorted searchsorted + one linear fold; rows of
    one key must fit a task (same per-key-boundedness contract as
    sessionize/cumulative_by_key). All integers; ties broken by
    (finish, start, value, tie) — a total order both engines share.
    Contract: durations strictly positive (s < f), so every
    predecessor candidate precedes the interval in finish order.

    Returns per key: (key, n_events, total_v, best_v)."""
    import numpy as np
    import pandas as pd

    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([f_col, s_col, v_col, tie_col], kind="mergesort")
        s = g[s_col].to_numpy(np.int64)
        f = g[f_col].to_numpy(np.int64)
        v = g[v_col].to_numpy(np.int64)
        n = len(g)
        dp = np.zeros(n + 1, dtype=np.int64)
        # p[i]: number of intervals finishing <= s_i (f ascending)
        p = np.searchsorted(f, s, side="right")
        for i in range(n):
            take = v[i] + dp[p[i]]
            dp[i + 1] = take if take > dp[i] else dp[i]
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_events": [n],
                "total_v": [int(v.sum())],
                "best_v": [int(dp[n])],
            }
        )

    return bucketed_map_groups(
        ds.select_columns([key_col, s_col, f_col, v_col, tie_col]),
        [key_col],
        fold,
    )
