"""Priority sampling — weight-sensitive fixed-size sampling with an
unbiased subset-sum estimator (Duffield, Lund & Thorup, JACM 2007:
take the k items of highest priority w/u with u uniform; estimate
any subset sum by Σ max(w_i, τ) over sampled members, τ = the
(k+1)-th priority — near-optimal variance among all k-sized
schemes).

Determinism contract: u is the md5-uniform of the item key —
priority = ``w · 2³⁶ // (h + 1)`` with h the 36-bit integer from 9
hex chars of ``md5(key)`` (36+weight bits stay inside int64/BIGINT) (+1 dodges division by zero), an exact
integer the oracle recomputes; ties (absent in practice) break by
key. Zero RNG — the weighted_sample/hash_sample discipline.

100-TB shape: priorities are stateless per row, the k-sample is the
block-local top-(k+1) combiner (ops/relational.topk) — one streamed
scan, no shuffle, no driver data beyond k+1 rows."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def priority_sample(
    ds,
    key_col: str,
    weight_col: str,
    k: int,
    est_flag_col: str | None = None,
) -> dict:
    """Top-k priority sample over integer weights. Returns
    ``{"sample": DataFrame(rank, key, weight, priority, flagged),
    "tau": int, "est_total": int, "est_flagged": int, "n_items":
    int, "true_total": int}`` — est_* are the DLT subset-sum
    estimates Σ max(w, τ); flagged estimates the rows where
    ``est_flag_col`` is 1."""
    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.relational import topk

    def prio(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.fromiter(
            (
                int(hashlib.md5(str(x).encode()).hexdigest()[:9], 16)
                for x in keys
            ),
            dtype=np.int64,
            count=len(keys),
        )
        p = (w * (1 << 36)) // (h + 1)  # int64-safe: w < 2^27
        cols = {
            "key": b[key_col],
            "weight": pa.array(w),
            "priority": pa.array(p),
        }
        if est_flag_col is not None:
            cols["flagged"] = b[est_flag_col]
        return pa.table(cols)

    pr = ds.map_batches(prio, batch_format="pyarrow")
    # totals: one combiner pass
    tot = grouped_agg(
        pr, ["weight"], {"c": (None, "count")}
    ).to_pandas()
    n_items = int(tot["c"].sum())
    true_total = int((tot["weight"] * tot["c"]).sum())

    top = topk(
        pr, ["priority", "key"], k + 1, [True, False]
    ).to_pandas()
    tau = int(top["priority"].iloc[k]) if len(top) > k else 0
    samp = top.head(k).reset_index(drop=True)
    samp.insert(0, "rank", np.arange(1, len(samp) + 1, dtype=np.int64))
    adj = np.maximum(samp["weight"].to_numpy(np.int64), tau)
    est_total = int(adj.sum())
    est_flagged = (
        int(adj[samp["flagged"].to_numpy(np.int64) == 1].sum())
        if "flagged" in samp.columns
        else 0
    )
    for c in ("weight", "priority"):
        samp[c] = samp[c].astype("int64")
    return {
        "sample": samp,
        "tau": tau,
        "est_total": est_total,
        "est_flagged": est_flagged,
        "n_items": n_items,
        "true_total": true_total,
    }
