"""Butterfly counting in bipartite graphs — the (2,2)-biclique
census (Wang et al., VLDB 2014; Sariyüce & Pinar's butterfly/tip
decomposition primitive — the bipartite analogue of triangle
counting, the densest-correlation signal in user-item / part-supplier
graphs).

Exact combinatorics: butterflies = Σ over same-side pairs (u,w) of
C(m_uw, 2) where m_uw = |N(u) ∩ N(w)| — computed by generating
wedges from the LOWER-degree side (each node of the chosen side
emits C(deg, 2) pairs; picking the side with the smaller pair total
is the standard cost rule, decided from a degree-histogram combiner
BEFORE any pair is materialized).

100-TB shape: dedup to distinct edges (grouped combiner), per-node
pair generation inside bucketed map_groups (all edges of a node
co-located by ONE key shuffle), pair counts by a second combiner,
ΣC(m,2) folds block-locally. Degree skew is visible in the returned
``max_wedge_node_pairs`` — the hot-node audit the skew docs call
for."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def butterfly_count(ds, left_col: str, right_col: str) -> pd.DataFrame:
    """One-row frame of exact integers over the bipartite edge
    Dataset (duplicate edges collapsed first): ``n_edges, n_left,
    n_right, wedge_side`` (0 = pairs over left nodes, 1 = right),
    ``n_wedges, n_butterflies, max_wedge_node_pairs``."""
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    edges = grouped_agg(
        ds, [left_col, right_col], {"_c": (None, "count")}
    ).drop_columns(["_c"]).materialize()

    deg = grouped_agg(
        edges, [left_col], {"d": (None, "count")}
    ).to_pandas()
    degr = grouped_agg(
        edges, [right_col], {"d": (None, "count")}
    ).to_pandas()
    n_left, n_right = len(deg), len(degr)
    n_edges = int(deg["d"].sum())
    pairs_left = int((deg["d"] * (deg["d"] - 1) // 2).sum())
    pairs_right = int((degr["d"] * (degr["d"] - 1) // 2).sum())
    # generate wedges from the side whose pair total is smaller;
    # tie -> left (0). "side" = the side whose nodes anchor wedges.
    side = 0 if pairs_left <= pairs_right else 1
    anchor, other = (
        (left_col, right_col) if side == 0 else (right_col, left_col)
    )
    max_np = int(
        ((deg if side == 0 else degr)["d"].max() or 0)
    )
    max_np = max_np * (max_np - 1) // 2

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        vs = np.sort(g[other].to_numpy())
        k = len(vs)
        if k < 2:
            return None
        iu, ju = np.triu_indices(k, 1)
        return pd.DataFrame({"a": vs[iu], "b": vs[ju]})

    wedges = bucketed_map_groups(edges, [anchor], gen_pairs)
    pc_tab = grouped_agg(wedges, ["a", "b"], {"m": (None, "count")})

    def fold(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "w": pa.array([int(m.sum())]),
                "bf": pa.array([int((m * (m - 1) // 2).sum())]),
            }
        )

    parts = pc_tab.map_batches(fold, batch_format="pyarrow").to_pandas()
    n_wedges = int(parts["w"].sum()) if "w" in parts.columns else 0
    n_bf = int(parts["bf"].sum()) if "bf" in parts.columns else 0
    return pd.DataFrame(
        {
            "n_edges": pd.array([n_edges], dtype="int64"),
            "n_left": pd.array([n_left], dtype="int64"),
            "n_right": pd.array([n_right], dtype="int64"),
            "wedge_side": pd.array([side], dtype="int64"),
            "n_wedges": pd.array([n_wedges], dtype="int64"),
            "n_butterflies": pd.array([n_bf], dtype="int64"),
            "max_wedge_node_pairs": pd.array([max_np], dtype="int64"),
        }
    )
