"""Greedy k-center coreset selection — the classic 2-approximation
(Gonzalez, "Clustering to minimize the maximum intercluster distance",
TCS 1985; the farthest-point-first data-selection pass used to pick
diverse training subsets from an embedding space).

Semantics (fully deterministic, SQL-replayable): seed = the point with
the smallest id; each round selects the point maximizing its squared
L2 distance to the nearest already-chosen center (tie → smallest id —
the ``ORDER BY d2 DESC, id LIMIT 1`` total order). Distances are
exact integers over micro-scaled coordinates — no floats anywhere.

100-TB shape: the selected-center set is tiny (k rows) and rides the
closure; the loop-carried state is a (id, x, y, d2min) Dataset updated
ONCE per round against the single new center (O(1) distance per point
per round — the standard running-min trick, not O(k)), re-materialized
per round like every fixed-round iterative op in this repo
(ops/kmeans.py, ops/sssp.py, ops/graph.py). Each round's argmax is a
per-block (max d2, min id) combiner — only |blocks| candidate rows
reach the driver, never points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def kcenter_greedy(ds, id_col: str, x_col: str, y_col: str, k: int) -> pd.DataFrame:
    """Select ``k`` centers. Returns (center_rank, id, radius2) where
    ``radius2`` is the squared distance the point had to its nearest
    prior center when chosen (0 for the seed) — the running coverage
    radius, non-increasing. Stops early when every point is already a
    center (radius2 would be 0)."""

    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                }
            )
        i = int(np.argmin(ids))
        return pa.table(
            {
                "id": pa.array([ids[i]]),
                "x": pa.array([b[x_col][i].as_py()], pa.int64()),
                "y": pa.array([b[y_col][i].as_py()], pa.int64()),
            }
        )

    cands = (
        ds.select_columns([id_col, x_col, y_col])
        .map_batches(seed_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if cands.empty:
        return pd.DataFrame(
            {"center_rank": [], "id": [], "radius2": []}
        ).astype("int64")
    seed = cands.sort_values("id").iloc[0]
    cx, cy, cid = int(seed["x"]), int(seed["y"]), int(seed["id"])
    centers = [(0, cid, 0)]

    def init_state(b: pa.Table, cx=cx, cy=cy) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = (x - cx) ** 2 + (y - cy) ** 2
        return pa.table(
            {
                "id": pa.array(ids),
                "x": pa.array(x),
                "y": pa.array(y),
                "d2": pa.array(d2),
            }
        )

    state = ds.select_columns([id_col, x_col, y_col]).map_batches(
        init_state, batch_format="pyarrow"
    ).materialize()

    for rank in range(1, k):

        def argmax_partial(b: pa.Table) -> pa.Table:
            d2 = b["d2"].to_numpy(zero_copy_only=False)
            ids = b["id"].to_numpy(zero_copy_only=False)
            if len(d2) == 0:
                return pa.table(
                    {
                        "id": pa.array([], pa.int64()),
                        "x": pa.array([], pa.int64()),
                        "y": pa.array([], pa.int64()),
                        "d2": pa.array([], pa.int64()),
                    }
                )
            m = d2.max()
            at = np.flatnonzero(d2 == m)
            i = at[np.argmin(ids[at])]  # tie -> smallest id
            return b.take([int(i)]).select(["id", "x", "y", "d2"])

        cand = (
            state.map_batches(argmax_partial, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["d2", "id"], ascending=[False, True], kind="mergesort")
        )
        best = cand.iloc[0]
        if int(best["d2"]) == 0:
            break  # every point coincides with a center already
        cx, cy = int(best["x"]), int(best["y"])
        centers.append((rank, int(best["id"]), int(best["d2"])))

        def update(b: pa.Table, cx=cx, cy=cy) -> pa.Table:
            x = b["x"].to_numpy(zero_copy_only=False)
            y = b["y"].to_numpy(zero_copy_only=False)
            d2 = b["d2"].to_numpy(zero_copy_only=False)
            nd = np.minimum(d2, (x - cx) ** 2 + (y - cy) ** 2)
            return pa.table(
                {"id": b["id"], "x": b["x"], "y": b["y"], "d2": pa.array(nd)}
            )

        state = state.map_batches(update, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        centers, columns=["center_rank", "id", "radius2"]
    ).astype("int64")
