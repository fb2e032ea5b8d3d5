"""Kernel herding — deterministic greedy mean-matching coreset
selection (Welling ICML 2009; Chen, Welling & Smola 2010: picking
points that keep the running sum closest to the scaled corpus mean
gives O(1/T) mean-approximation error vs O(1/√T) for random
sampling — the distillation/coreset selector that needs NO RNG).

Integer contract: embeddings quantize to milli-ints (floor(x·1000 +
0.5) in float64 — reproducible in SQL), and round r scores each
candidate x by ``Σ_d (n·(S_d + x_d) − r·T_d)²`` — the cross-
multiplied form of ||mean_sel − mean_corpus||² that never divides;
ties break to the smallest vec_id. All int64 (bounds documented in
tests).

100-TB shape: T (per-dim corpus sum) is ONE combiner scan; each
round is ONE streamed scan computing block-local argmin against the
broadcast (S, chosen) state, with ≤ |blocks| candidate rows reaching
the driver — the boruvka/kcenter selection discipline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _quant(b: pa.Table, vec_col: str) -> np.ndarray:
    e = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
    return np.floor(e * 1000.0 + 0.5).astype(np.int64)


def herd_select(ds, id_col: str, vec_col: str, k: int = 8) -> pd.DataFrame:
    """Greedy herding selection of ``k`` vectors. Returns one row per
    round: ``(round, vec_id, cost)`` — cost is the exact integer
    objective of the chosen vector at that round."""
    import ray

    mat = ds.materialize()

    def sums(b: pa.Table) -> pa.Table:
        q = _quant(b, vec_col)
        return pa.table(
            {
                "t": pa.array(q.sum(axis=0)),
                "c": pa.array(
                    np.full(q.shape[1], len(q), dtype=np.int64)
                ),
                "d": pa.array(np.arange(q.shape[1], dtype=np.int64)),
            }
        )

    from ocr_service_ray.ops.agg import grouped_agg

    tt = (
        grouped_agg(
            mat.map_batches(sums, batch_format="pyarrow"),
            ["d"],
            {"t": ("t", "sum"), "c": ("c", "sum")},
        )
        .to_pandas()
        .sort_values("d")
    )
    T = tt["t"].to_numpy(np.int64)
    n = int(tt["c"].iloc[0])

    S = np.zeros_like(T)
    chosen: list[int] = []
    rows = []
    for r in range(1, k + 1):
        ref = ray.put((S.copy(), set(chosen), r))

        def block_best(b: pa.Table, ref=ref) -> pa.Table:
            Sb, ch, rr = ray.get(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            q = _quant(b, vec_col)
            resid = n * (Sb[None, :] + q) - rr * T[None, :]
            cost = (resid * resid).sum(axis=1)
            mask = np.array([i not in ch for i in ids])
            if not mask.any():
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "cost": pa.array([], pa.int64()),
                        "q": pa.array([], pa.list_(pa.int64())),
                    }
                )
            ids, cost, q = ids[mask], cost[mask], q[mask]
            j = np.lexsort((ids, cost))[0]
            return pa.table(
                {
                    "vec_id": pa.array([ids[j]]),
                    "cost": pa.array([cost[j]]),
                    "q": pa.array([q[j].tolist()]),
                }
            )

        cand = mat.map_batches(block_best, batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(["cost", "vec_id"]).reset_index(drop=True)
        vid, cost = int(cand["vec_id"].iloc[0]), int(cand["cost"].iloc[0])
        chosen.append(vid)
        rows.append({"round": r, "vec_id": vid, "cost": cost})
        # winner's quantized vector rode along with the argmin row —
        # no second scan needed to update S
        win = cand.iloc[0]["q"]
        S = S + np.asarray(win, dtype=np.int64)

    return pd.DataFrame(rows).astype("int64")
