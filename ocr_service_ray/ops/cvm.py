"""Cramér-von Mises two-sample distance — Anderson 1962: the
integrated squared ECDF gap, weighted by the combined distribution.
Completes the repo's distribution-shift quartet (KS sup-gap,
Wasserstein transport, energy distance, and now the L2 ECDF form —
each weights tail vs body differently, which is why drift monitors
ship several).

Exact-integer contract (counts-based form, ties handled naturally):
  over distinct combined values x with per-sample counts c1, c2 and
  cumulative C1, C2:
    num   = sum_x (C1(x)*m - C2(x)*n)^2 * (c1(x) + c2(x))
    cvm_micro = 10^6 * n * m * num // ((n + m)^3 * n^2 * m^2)
  (the nm/(n+m)^2 * sum (F1-F2)^2 dH form with dH = (c1+c2)/(n+m),
  all integer).

100-TB shape: one (group, value) count combiner; the merge-and-sum
closes on the bounded distinct-value table."""

from __future__ import annotations

import pandas as pd


def cvm_micro(counts: pd.DataFrame, value_col: str, c1_col: str, c2_col: str) -> tuple[int, int, int]:
    """(n, m, cvm_micro) from a per-distinct-value count table."""
    t = counts.sort_values(value_col).reset_index(drop=True)
    c1 = [int(x) for x in t[c1_col]]
    c2 = [int(x) for x in t[c2_col]]
    n, m = sum(c1), sum(c2)
    num = 0
    C1 = C2 = 0
    for a, b in zip(c1, c2):
        C1 += a
        C2 += b
        num += (C1 * m - C2 * n) ** 2 * (a + b)
    if n == 0 or m == 0:
        return n, m, 0
    micro = (10**6 * n * m * num) // ((n + m) ** 3 * n**2 * m**2)
    return n, m, micro


def cvm_lengths_by_source(ds, source_a: str, source_b: str) -> pd.DataFrame:
    """One-row (source_a, source_b, n, m, cvm_micro) comparing text
    LENGTH distributions of two sources."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_service_ray.ops.agg import grouped_agg

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b["source"], value_set=pa.array([source_a, source_b])
        )
        t = b.filter(keep)
        return pa.table(
            {
                "src": t["source"],
                "ln": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    cnt = (
        grouped_agg(
            ds.map_batches(proj, batch_format="pyarrow"),
            ["src", "ln"],
            {"c": (None, "count")},
        )
        .to_pandas()
    )
    piv = (
        cnt.pivot_table(
            index="ln", columns="src", values="c", aggfunc="sum", fill_value=0
        )
        .reset_index()
    )
    for s in (source_a, source_b):
        if s not in piv.columns:
            piv[s] = 0
    n, m, micro = cvm_micro(piv, "ln", source_a, source_b)
    return pd.DataFrame(
        {
            "source_a": [source_a],
            "source_b": [source_b],
            "n": [n],
            "m": [m],
            "cvm_micro": [micro],
        }
    ).astype({"n": "int64", "m": "int64", "cvm_micro": "int64"})
