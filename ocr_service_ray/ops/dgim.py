"""DGIM sliding-window bit counting — the exponential-histogram
sketch (Datar, Gionis, Indyk & Motwani, SODA 2002: count the 1s in
the last W positions of a stream with O(log² W) memory and ≤ 50%
error from the single straddling bucket — THE textbook answer to
"how many purchases in the user's last N actions" without storing
the actions).

Bucket discipline (deterministic, replayed step-by-step by the
oracle): every 1-bit opens a size-1 bucket stamped with its
position; whenever THREE buckets share a size, the two OLDEST merge
into one of twice the size stamped with the newer position — the
cascade climbs sizes strictly, so each transition is either one
merge (at the cascade size T) or one stream advance (T resets to 1).
Estimate over the last W positions: full sizes of every in-window
bucket except the oldest, plus (oldest_size + 1) // 2.

100-TB shape: streams are per-key and each key's fold runs inside
one bucketed key shuffle (the sessionize discipline); state per key
is O(log² W) — the whole point of the sketch."""

from __future__ import annotations

import numpy as np
import pandas as pd


def dgim_fold(bits: list[int]) -> list[tuple[int, int]]:
    """Run the DGIM merge discipline over a bit sequence; returns the
    final bucket list as (pos, size), pos 1-based, oldest first."""
    bk: list[tuple[int, int]] = []  # (pos, size), kept sorted by pos
    for i, b in enumerate(bits, start=1):
        if not b:
            continue
        bk.append((i, 1))
        t = 1
        while True:
            same = [x for x in bk if x[1] == t]
            if len(same) < 3:
                break
            o1, o2 = same[0], same[1]  # two oldest (pos ascending)
            bk = [x for x in bk if x not in (o1, o2)]
            bk.append((o2[0], t * 2))
            bk.sort()
            t *= 2
    return bk


def dgim_estimate(bk: list[tuple[int, int]], n: int, w: int) -> int:
    """Window estimate over positions > n - w."""
    inw = [x for x in bk if x[0] > n - w]
    if not inw:
        return 0
    oldest = inw[0]
    return sum(s for _, s in inw[1:]) + (oldest[1] + 1) // 2


def user_dgim(ds, key_col: str, ts_col: str, bit_col: str, window: int = 16) -> pd.DataFrame:
    """Per-key DGIM over the (ts, id)-ordered bit stream. Input needs
    an ordering tiebreak column named ``event_id``. Returns
    ``(key, n_events, n_ones, true_w, est_w, n_buckets,
    max_bucket)`` — est_w within 50% of true_w by the DGIM bound
    (asserted in tests)."""
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        bits = g[bit_col].to_numpy(np.int64).tolist()
        bk = dgim_fold(bits)
        n = len(bits)
        true_w = int(sum(bits[max(0, n - window) :]))
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_events": [n],
                "n_ones": [int(sum(bits))],
                "true_w": [true_w],
                "est_w": [dgim_estimate(bk, n, window)],
                "n_buckets": [len(bk)],
                "max_bucket": [max((s for _, s in bk), default=0)],
            }
        )

    out = bucketed_map_groups(
        ds.select_columns([key_col, ts_col, "event_id", bit_col]),
        [key_col],
        fold,
    ).to_pandas()
    out = out.sort_values(key_col).reset_index(drop=True)
    for c in out.columns:
        if c != key_col:
            out[c] = out[c].astype("int64")
    return out
