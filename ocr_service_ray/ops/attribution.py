"""Linear multi-touch attribution — credit each conversion equally
across the user's preceding touch events inside a lookback window
(the marketing / engagement-analytics shape; the credit-assignment
sibling of ``ops/funnel.py``'s ordered-step counting).

Semantics (integer-exact, SQL-reproducible):

- a conversion at time T credits the user's touches with
  ``T - window ≤ ts < T`` (strictly before — the conversion itself
  never self-credits);
- each of the ``n`` touches receives ``1e6 // n`` ppm; the EARLIEST
  touch (ties → smaller event id) receives the remainder
  ``1e6 % n`` on top, so every attributed conversion's credits sum
  to exactly 1,000,000 — no float splitting, no leakage;
- a touch may be credited by several conversions (each conversion
  attributes independently); conversions with zero in-window touches
  are unattributed and counted separately.

100 TB shape: ONE bucketed user-key shuffle
(``ops/agg.bucketed_map_groups`` — rows of a user land together
exactly once), per-user vectorized window lookup (sorted touch
timestamps + ``np.searchsorted`` per conversion), and a
|touch-types|-bounded combiner for the rollup. No self-join of the
event table (the naive SQL shape is an O(conversions × touches)
range join; the oracle pays it at sf-scale so the engine doesn't
have to at corpus scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["linear_attribution"]

PPM = 1_000_000


def linear_attribution(
    events_ds,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    window_us: int = 24 * 3600 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
):
    """pandas rollup ``(event_type, n_credits, total_credit_ppm,
    n_unattributed)`` per touch type, sorted by event_type —
    ``n_unattributed`` (conversions with no in-window touch) repeats
    on every row (a grand total, kept in-table so one result frame
    carries the whole audit)."""
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    keep = set(touch_types) | {conversion_type}

    def project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(b[type_col], value_set=pa.array(sorted(keep)))
        b = b.filter(m)
        us = b[ts_col].cast(pa.int64())  # timestamp[us] → µs ints, exact
        return pa.table(
            {
                user_col: b[user_col],
                "ts_us": us,
                id_col: b[id_col].cast(pa.int64()),
                type_col: b[type_col],
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame | None:
        conv = g[g[type_col] == conversion_type]
        touches = g[g[type_col] != conversion_type].sort_values(
            ["ts_us", id_col]
        )
        t_ts = touches["ts_us"].to_numpy(dtype=np.int64)
        t_type = touches[type_col].to_numpy()
        out_type, out_credit = [], []
        unattributed = 0
        for _, c in conv.iterrows():
            lo = np.searchsorted(t_ts, int(c["ts_us"]) - window_us, side="left")
            hi = np.searchsorted(t_ts, int(c["ts_us"]), side="left")
            n = hi - lo
            if n == 0:
                unattributed += 1
                continue
            base, rem = PPM // n, PPM % n
            out_type.extend(t_type[lo:hi])
            credits = np.full(n, base, dtype=np.int64)
            credits[0] += rem  # earliest (ties broken by event id in sort)
            out_credit.extend(credits)
        rows_type = list(out_type)
        rows_credit = list(out_credit)
        rows_unattr = [0] * len(rows_type)
        if unattributed:
            # string sentinel (not NULL — null group keys complicate
            # the hash shuffle for no benefit here)
            rows_type.append("__unattributed__")
            rows_credit.append(0)
            rows_unattr.append(unattributed)
        if not rows_type:
            return None
        return pd.DataFrame(
            {
                "touch_type": pd.Series(rows_type, dtype="object"),
                "credit_ppm": pd.Series(rows_credit, dtype="int64"),
                "unattributed": pd.Series(rows_unattr, dtype="int64"),
            }
        )

    detail = bucketed_map_groups(
        events_ds.map_batches(project, batch_format="pyarrow"),
        [user_col],
        per_user,
    )
    roll = grouped_agg(
        detail,
        ["touch_type"],
        {
            "n_credits": ("credit_ppm", "count"),
            "total_credit_ppm": ("credit_ppm", "sum"),
            "unattr_part": ("unattributed", "sum"),
        },
    ).to_pandas()
    n_unattr = int(roll["unattr_part"].sum())
    roll = roll[roll["touch_type"] != "__unattributed__"].copy()
    roll["n_unattributed"] = np.int64(n_unattr)
    roll = roll.drop(columns=["unattr_part"]).rename(
        columns={"touch_type": "event_type"}
    )
    for c in ("n_credits", "total_credit_ppm", "n_unattributed"):
        roll[c] = roll[c].astype("int64")
    return roll.sort_values("event_type").reset_index(drop=True)
