"""Poisson bootstrap confidence intervals — THE distributed bootstrap
(Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012): classic resampling needs n draws from n rows (a global
operation), but Poisson(1) multiplicities per row are independent, so
every block computes its resample partials locally and B resamples
ride ONE combiner exchange of |groups|·B partial rows. Uncertainty
for free at 100 TB — no second pass, no row shuffle.

Zero-RNG discipline: row r's multiplicity in resample b inverts the
Poisson(1) CDF at the md5-uniform of ``(salt, b, id)`` — the repo's
deterministic-sampling rule (layout-invariant, resume-safe, and the
oracle recomputes every draw). The CDF thresholds are hardcoded
float64 LITERALS shared verbatim with the SQL text, so both engines
compare against bit-identical constants (the constants being
transcendental in origin is irrelevant — only the literal is used).

Integer-exact outputs: resample means are ``(Σ m·cents · 10⁴) //
Σ m`` micro-ints; the interval is the order statistic of the B means
at ranks ``(5·(B−1))//100`` and ``(95·(B−1))//100``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["poisson_bootstrap_ci", "POISSON1_CDF"]

# P(X <= k) for X ~ Poisson(1), k = 0..7; multiplicity caps at 8.
# float64 literals — the SQL oracle embeds repr() of EXACTLY these.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def _multiplicity(u: float) -> int:
    for k, c in enumerate(POISSON1_CDF):
        if u < c:
            return k
    return 8


def poisson_bootstrap_ci(
    ds,
    group_col: str,
    id_col: str,
    cents_fn,
    n_resamples: int = 32,
    salt: str = "boot",
):
    """pandas ``(group, mean_micro, lo_micro, hi_micro)`` per group,
    sorted by group: the full-data mean plus the 5th/95th-percentile
    resample means. ``cents_fn(batch) -> (groups, ids, cents)`` owns
    the integer projection (the caller's exact-cents discipline)."""
    from ocr_service_ray.ops.agg import grouped_agg

    B = n_resamples

    def partials(batch: pa.Table) -> pa.Table:
        groups, ids, cents = cents_fn(batch)
        acc: dict = {}
        for g, i, c in zip(groups, ids, cents):
            for b in range(B):
                u = (
                    int(
                        hashlib.md5(f"{salt}:{b}:{i}".encode()).hexdigest()[:16],
                        16,
                    )
                    / 2**64
                )
                m = _multiplicity(u)
                if m:
                    key = (g, b)
                    row = acc.setdefault(key, [0, 0])
                    row[0] += m * int(c)
                    row[1] += m
            key = (g, -1)  # the full-data (unresampled) accumulator
            row = acc.setdefault(key, [0, 0])
            row[0] += int(c)
            row[1] += 1
        ks = list(acc.keys())
        return pa.table(
            {
                "g": pa.array([k[0] for k in ks]),
                "b": pa.array([k[1] for k in ks], pa.int64()),
                "sv": pa.array([acc[k][0] for k in ks], pa.int64()),
                "sm": pa.array([acc[k][1] for k in ks], pa.int64()),
            }
        )

    merged = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["g", "b"],
        {"sv": ("sv", "sum"), "sm": ("sm", "sum")},
    ).to_pandas()

    lo_i = (5 * (B - 1)) // 100
    hi_i = (95 * (B - 1)) // 100
    rows = []
    for g, part in merged.groupby("g"):
        full = part[part["b"] == -1].iloc[0]
        mean_micro = int(full["sv"]) * 10_000 // int(full["sm"])
        res = part[(part["b"] >= 0) & (part["sm"] > 0)]
        means = sorted(
            int(sv) * 10_000 // int(sm)
            for sv, sm in zip(res["sv"], res["sm"])
        )
        rows.append((g, mean_micro, means[lo_i], means[hi_i]))
    out = pd.DataFrame(
        rows, columns=[group_col, "mean_micro", "lo_micro", "hi_micro"]
    ).sort_values(group_col)
    for c in ("mean_micro", "lo_micro", "hi_micro"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)
