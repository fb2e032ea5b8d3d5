"""Cross-source quantile normalization — map each source's value
distribution onto the pooled corpus distribution (the rank-map
variant of Bolstad et al., "A comparison of normalization methods
for high density oligonucleotide array data", Bioinformatics 2003;
in LLM-data terms: equalize per-source length/score distributions
before mixing so no source dominates a band).

Semantics (deterministic, SQL-replayable): for a value v in source g
with within-source cumulative count r (rank of its last duplicate)
out of n_g rows, the normalized value is the pooled
``quantile_disc``-style order statistic at the same percentile —
the smallest pooled value whose cumulative count ≥ ceil(r·N / n_g).
Pure integer arithmetic end to end.

100-TB shape: ONE (source, value)-count combiner is the only
exchange (the value-counts discipline — raw rows never shuffle);
the rank map closes on the |distinct (source, value)|-bounded count
table. The bounded-cardinality contract is the same as every
value-counts op (L16/L34): discrete codes, lengths, cents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def quantile_normalize_counts(vc: pd.DataFrame) -> pd.DataFrame:
    """Close over a (g, val, c) count table: returns it with
    ``norm_val`` appended (the pooled order statistic each distinct
    (g, val) maps to). Driver arithmetic on the bounded table."""
    if vc.empty:
        out = vc.copy()
        out["norm_val"] = pd.Series(dtype="int64")
        return out
    vc = vc.sort_values(["g", "val"], kind="mergesort").reset_index(drop=True)
    vc["r"] = vc.groupby("g", sort=False)["c"].cumsum()
    n_g = vc.groupby("g", sort=False)["c"].transform("sum")
    pooled = (
        vc.groupby("val", sort=True)["c"].sum().reset_index(name="pc")
    )
    pcum = pooled["pc"].cumsum().to_numpy()
    N = int(pcum[-1])
    # ceil(r*N / n_g) in exact python ints (r*N can exceed int64 at
    # extreme corpus sizes; the loop runs over the bounded count table)
    targets = np.fromiter(
        (
            (int(r) * N + int(n) - 1) // int(n)
            for r, n in zip(vc["r"], n_g)
        ),
        dtype=np.int64,
        count=len(vc),
    )
    idx = np.searchsorted(pcum, targets, side="left")
    vc["norm_val"] = pooled["val"].to_numpy()[idx]
    return vc.drop(columns=["r"])


def quantile_normalize(ds, group_col: str, value_col: str) -> pd.DataFrame:
    """Distributed entry: one (group, value)-count combiner, then the
    driver rank-map close. Returns the per-(g, val) mapping table
    (g, val, c, norm_val) — callers join it back or aggregate it."""
    from ocr_service_ray.ops.agg import grouped_agg

    vc = grouped_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        {"c": (None, "count")},
    ).to_pandas()
    if vc.empty:
        return pd.DataFrame(
            {
                "g": pd.Series(dtype=object),
                "val": pd.Series(dtype="int64"),
                "c": pd.Series(dtype="int64"),
                "norm_val": pd.Series(dtype="int64"),
            }
        )
    vc = vc.rename(columns={group_col: "g", value_col: "val"}).dropna()
    return quantile_normalize_counts(vc)
