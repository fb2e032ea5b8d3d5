"""Attribute mixing matrix + Newman assortativity — Newman 2003:
how often edges stay within an attribute class vs cross it. With
directed stub counts c_ij over m2 = 2m stubs, the coefficient
  r = (m2 * tr(c) - sum_i row_i * col_i) / (m2^2 - sum_i row_i col_i)
is a ratio of INTEGERS — reported as (r_num, r_den), no floats, so
homophily is exact and SQL-replayable. The category sibling of
degree_assortativity (ops/assortativity.py).

Output: one row per (class_a, class_b) with the stub count, plus
the global r_num/r_den attached to every row (constant columns —
the span_structure_profile convention for scalar summaries).

100-TB shape: one grouped count over the class-labelled symmetrized
edge list (bounded classes); the rational close is driver-side."""

from __future__ import annotations

import pandas as pd


def mixing_assortativity(
    edges: pd.DataFrame, cls: dict[int, int]
) -> pd.DataFrame:
    """Edges (``src``, ``dst``; symmetrized internally, self-loops
    dropped) + node->class map. Returns (class_a, class_b, n_stubs,
    r_num, r_den)."""
    pairs = set()
    for a, b in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    counts: dict[tuple[int, int], int] = {}
    for a, b in sorted(pairs):
        key = (cls[a], cls[b])
        counts[key] = counts.get(key, 0) + 1
    m2 = sum(counts.values())
    classes = sorted({c for k in counts for c in k})
    row = {i: sum(counts.get((i, j), 0) for j in classes) for i in classes}
    col = {j: sum(counts.get((i, j), 0) for i in classes) for j in classes}
    tr = sum(counts.get((i, i), 0) for i in classes)
    srb = sum(row[i] * col[i] for i in classes)
    r_num = m2 * tr - srb
    r_den = m2 * m2 - srb
    rows = [
        (a, b, counts[(a, b)], r_num, r_den)
        for (a, b) in sorted(counts)
    ]
    return pd.DataFrame(
        rows, columns=["class_a", "class_b", "n_stubs", "r_num", "r_den"]
    ).astype("int64")
