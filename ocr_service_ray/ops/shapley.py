"""Exact Shapley-value attribution over coalition reach — the
canonical fair-division credit split (Shapley 1953; the attribution
scheme behind SHAP and marketing-mix audience credit), computed
EXACTLY over the coalition lattice instead of by sampling.

Game: players = event types (channels); v(S) = number of distinct
users touched by at least one channel in S — the union-coverage
game, submodular, where naive "last touch" or proportional splits
misattribute shared audiences. With n ≤ ~12 players the 2^n lattice
is enumerable and Shapley is exact:
``φ_i = Σ_{S ⊆ N∖{i}} |S|!(n−1−|S|)!·(v(S∪i)−v(S)) / n!`` — all
integers; the micro output floors ``10⁶·num/n!`` once at the end.

100-TB shape: raw events collapse to per-user channel BITMASKS by
two combiners ((user, bit) dedup, then per-user bit sum — the D2
distinct-in-group discipline; sum = OR after dedup), then masks
collapse to ≤ 2^n (mask, user_count) rows — the entire lattice close
runs on that tiny table. Users never leave the cluster."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def user_channel_masks(ds, user_col: str, type_col: str):
    """(mask, n_users) Dataset: channel bit = alphabetical rank of
    the type; per-user mask via dedup-then-sum combiners."""
    from ocr_service_ray.ops.agg import grouped_agg

    types = sorted(
        r[type_col]
        for r in grouped_agg(ds, [type_col], {"_c": (None, "count")}).take_all()
    )
    bit_of = {t: i for i, t in enumerate(types)}

    def to_bits(b: pa.Table) -> pa.Table:
        tv = b[type_col].to_pylist()
        return pa.table(
            {
                "u": b[user_col],
                "bit": pa.array(
                    np.array([1 << bit_of[t] for t in tv], dtype=np.int64)
                ),
            }
        )

    pairs = grouped_agg(
        ds.map_batches(to_bits, batch_format="pyarrow"),
        ["u", "bit"],
        {"_c": (None, "count")},
    )
    masks = grouped_agg(pairs, ["u"], {"mask": ("bit", "sum")})
    return (
        grouped_agg(masks, ["mask"], {"n_users": (None, "count")}),
        types,
    )


def shapley_reach(ds, user_col: str, type_col: str) -> pd.DataFrame:
    """One row per channel: ``(channel, bit, v_solo, marginal_to_all,
    shapley_num, shapley_micro)`` — shapley_num is the exact integer
    numerator over n! and Σ shapley_num = n!·v(N) (efficiency)."""
    mask_ds, types = user_channel_masks(ds, user_col, type_col)
    mc = {
        int(r["mask"]): int(r["n_users"]) for r in mask_ds.take_all()
    }
    n = len(types)
    full = (1 << n) - 1

    def v(s: int) -> int:
        return sum(c for m, c in mc.items() if m & s)

    fact = [math.factorial(k) for k in range(n + 1)]
    rows = []
    for i, t in enumerate(types):
        b = 1 << i
        num = 0
        for s in range(1 << n):
            if s & b:
                continue
            k = bin(s).count("1")
            num += fact[k] * fact[n - 1 - k] * (v(s | b) - v(s))
        rows.append(
            {
                "channel": t,
                "bit": i,
                "v_solo": v(b),
                "marginal_to_all": v(full) - v(full ^ b),
                "shapley_num": num,
                "shapley_micro": (1_000_000 * num) // fact[n],
            }
        )
    out = pd.DataFrame(rows)
    for c in ("bit", "v_solo", "marginal_to_all", "shapley_num", "shapley_micro"):
        out[c] = out[c].astype("int64")
    return out
