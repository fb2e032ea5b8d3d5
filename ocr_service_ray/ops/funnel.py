"""Ordered funnel analysis — how many users completed stage 1, then
stage 2 STRICTLY AFTER it, then stage 3 after that, … (the product-
analytics "conversion funnel", and the behavioral-sequence labeling
step of event-stream training data).

Matching rule (the standard first-touch funnel): a user reaches stage
``k`` iff an event of type ``stages[k]`` exists strictly after the
EARLIEST time the user reached stage ``k-1``. Greedy-earliest is the
optimal matcher here: taking the minimal qualifying timestamp at every
stage dominates any other assignment, so no backtracking is needed.

100-TB shape: ONE coarse-bucket key shuffle co-locates each user
(same per-key-boundedness contract as ``sessionize``); the per-user
fold is |stages| vectorized mask/min passes; the result table is one
row per user, collapsed to |stages| rows by a combiner count. The
driver only ever sees |stages| integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def funnel_stages(
    ds,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Returns a DataFrame ``(stage_idx, stage, n_users)`` — one row
    per funnel stage, ``n_users`` = users whose ordered event history
    reaches at least that stage. Ties on the boundary timestamp do NOT
    advance the funnel (strictly-after semantics, deterministic under
    any block layout)."""
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    if not stages:
        raise ValueError("stages must be non-empty")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.astype("datetime64[us]").astype(np.int64)
        else:
            ts = ts.astype(np.int64)
        types = g[type_col].to_numpy()
        cur = np.iinfo(np.int64).min
        reached = 0
        for s in stages:
            m = (types == s) & (ts > cur)
            if not m.any():
                break
            cur = ts[m].min()
            reached += 1
        return pd.DataFrame(
            {user_col: [g[user_col].iloc[0]], "stage_reached": [reached]}
        )

    per_user = bucketed_map_groups(ds, [user_col], fold)
    counts = grouped_agg(
        per_user, ["stage_reached"], {"n": (None, "count")}
    ).to_pandas()
    by_reached = dict(zip(counts["stage_reached"], counts["n"])) if not counts.empty else {}
    rows = []
    for k in range(len(stages), 0, -1):
        below = rows[-1][2] if rows else 0
        rows.append((k, stages[k - 1], below + int(by_reached.get(k, 0))))
    rows.reverse()
    return pd.DataFrame(rows, columns=["stage_idx", "stage", "n_users"])


def funnel_by_cohort(
    ds,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    cohort_fmt: str = "%Y-%m",
) -> pd.DataFrame:
    """Per-cohort conversion funnel: users are cohorted by the
    calendar period (``cohort_fmt``) of their FIRST event, and the
    strictly-after funnel of ``funnel_stages`` is counted per cohort —
    the retention/conversion-by-signup-month table. Same one-shuffle
    shape: the per-user fold also derives the cohort (the user's rows
    are already co-located), the merge is |cohorts| x |stages|
    bounded.

    Returns ``(cohort, stage_idx, stage, n_users)`` for every cohort
    that has users, all stages listed (zero rows included)."""
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    if not stages:
        raise ValueError("stages must be non-empty")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            ts_i = ts.astype("datetime64[us]").astype(np.int64)
        else:
            ts_i = ts.astype(np.int64)
        types = g[type_col].to_numpy()
        cohort = pd.Timestamp(ts.min()).strftime(cohort_fmt)
        cur = np.iinfo(np.int64).min
        reached = 0
        for s in stages:
            m = (types == s) & (ts_i > cur)
            if not m.any():
                break
            cur = ts_i[m].min()
            reached += 1
        return pd.DataFrame({"cohort": [cohort], "stage_reached": [reached]})

    per_user = bucketed_map_groups(ds, [user_col], fold)
    counts = grouped_agg(
        per_user, ["cohort", "stage_reached"], {"n": (None, "count")}
    ).to_pandas()
    rows = []
    if not counts.empty:
        for cohort, sub in counts.groupby("cohort", sort=True):
            by_reached = dict(zip(sub["stage_reached"], sub["n"]))
            acc = 0
            level_rows = []
            for k in range(len(stages), 0, -1):
                acc += int(by_reached.get(k, 0))
                level_rows.append((cohort, k, stages[k - 1], acc))
            rows.extend(reversed(level_rows))
    return pd.DataFrame(rows, columns=["cohort", "stage_idx", "stage", "n_users"])
