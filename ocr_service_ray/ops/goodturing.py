"""Good-Turing frequency re-estimation — Good 1953: the
count-of-counts table N_r and the re-estimated frequency
r* = (r+1) N_{r+1} / N_r, the classical smoothing behind Katz
back-off and the standard estimate of unseen-mass (N_1 / N). All
integer/micro arithmetic — the engine and the SQL oracle agree
bit-for-bit.

Contract:
  token counts c(t) over whitespace tokens; N_r = #{t : c(t) = r}
  for r = 1..cap; rows report (r, n_r, gt_rstar_micro) with
  gt_rstar_micro = 10^6 (r+1) N_{r+1} // N_r (0 when either N is 0)
  plus row r = 0 carrying (0, distinct_tokens, unseen_mass_ppm =
  10^6 N_1 // total_tokens).

100-TB shape: token counts are one combiner aggregate (hapax-heavy
vocabularies: this table is the op's one shuffle — see ops/heavy.py
for the sketch path); the count-of-counts fold is a second tiny
combiner over |vocab| rows, never raw text."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def good_turing(ds, text_col: str, cap: int = 20) -> pd.DataFrame:
    from ocr_service_ray.ops.agg import grouped_agg

    def toks(b: pa.Table) -> pa.Table:
        out = []
        for t in b[text_col].to_pylist():
            out.extend((t or "").split(" "))
        return pa.table({"tok": pa.array(out, pa.string())})

    counts = grouped_agg(
        ds.map_batches(toks, batch_format="pyarrow"),
        ["tok"],
        {"c": (None, "count")},
    )

    def cc(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "r": pa.array(np.minimum(c, np.int64(cap + 2))),
                "n": pa.array(np.ones(len(c), np.int64)),
                "tot": pa.array(c),
            }
        )

    nr = (
        grouped_agg(
            counts.map_batches(cc, batch_format="pyarrow"),
            ["r"],
            {"n_r": ("n", "sum"), "tot": ("tot", "sum")},
        )
        .to_pandas()
        .sort_values("r")
        .reset_index(drop=True)
    )
    n_of = dict(zip(nr["r"].astype(int), nr["n_r"].astype(int)))
    total_tokens = int(nr["tot"].sum())
    distinct = int(nr["n_r"].sum())
    rows = [
        (
            0,
            distinct,
            1_000_000 * n_of.get(1, 0) // total_tokens if total_tokens else 0,
        )
    ]
    for r in range(1, cap + 1):
        nr_ = n_of.get(r, 0)
        nr1 = n_of.get(r + 1, 0)
        star = 1_000_000 * (r + 1) * nr1 // nr_ if nr_ and nr1 else 0
        rows.append((r, nr_, star))
    return pd.DataFrame(
        rows, columns=["r", "n_r", "gt_rstar_micro"]
    ).astype("int64")
