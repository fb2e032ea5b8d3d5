"""Modularity decomposition — Newman & Girvan 2004: Q = sum over
communities of (e_c/m - (d_c/2m)^2), the standard quality score of
a graph partition. Computed here as EXACT integers: each
community's contribution is reported as the numerator
  contrib_num = 4*m*e_c - d_c^2       (denominator 4*m^2)
so Q = sum(contrib_num) / (4*m^2) with no floating division — the
oracle reproduces every numerator, and callers can rank or sum
communities exactly.

100-TB shape: labels come from the fixed-round LPA (ops/labelprop);
degrees, internal-edge counts and community sums are grouped folds
over the bounded combiner edge list."""

from __future__ import annotations

import pandas as pd


def modularity_decomposition(
    und_edges: pd.DataFrame, labels: pd.DataFrame
) -> pd.DataFrame:
    """Per-community modularity contributions over a canonical
    undirected edge list (``src`` < ``dst``, deduped) and a
    ``(node, label)`` table. Returns ``(label, n_members,
    internal_edges, degree_sum, contrib_num, m_edges)``."""
    lab = dict(zip(labels["node"].astype(int), labels["label"].astype(int)))
    m = len(und_edges)
    deg: dict[int, int] = {v: 0 for v in lab}
    e_in: dict[int, int] = {}
    for a, b in zip(und_edges["src"].astype(int), und_edges["dst"].astype(int)):
        deg[a] += 1
        deg[b] += 1
        if lab[a] == lab[b]:
            e_in[lab[a]] = e_in.get(lab[a], 0) + 1
    rows = []
    for c in sorted(set(lab.values())):
        members = [v for v in lab if lab[v] == c]
        dsum = sum(deg[v] for v in members)
        ec = e_in.get(c, 0)
        rows.append((c, len(members), ec, dsum, 4 * m * ec - dsum * dsum, m))
    return pd.DataFrame(
        rows,
        columns=[
            "label",
            "n_members",
            "internal_edges",
            "degree_sum",
            "contrib_num",
            "m_edges",
        ],
    ).astype("int64")
