"""Exact distributed triangle counting (degree-oriented wedge join).

The classic compact-forward / degree-orientation algorithm expressed
as Ray Data combiner aggregates — no driver-side adjacency, no
all-pairs work:

1. canonicalize + dedup edges ``(lo, hi)`` with one combiner agg;
2. compute degrees with a second combiner agg over exploded
   endpoints (|V| rows, stays distributed);
3. attach ``deg`` to both endpoints via hash joins and orient every
   edge from the ``(deg, id)``-smaller endpoint to the larger — each
   node's out-degree is then O(sqrt(m)), which bounds the wedge
   explosion regardless of raw-degree skew (a celebrity node with
   10^6 neighbours contributes wedges only through its *incoming*
   oriented edges);
4. per source node, emit candidate wedge closures ``(b, c)`` with
   ``k(b) < k(c)`` (bucketed key shuffle, pairs bounded by
   out-degree^2 <= m);
5. count closures whose ``(b, c)`` is itself an oriented edge via a
   presence-tagged union + one combiner agg (the ``set_op`` pattern
   — no join materialization).

Every triangle {x, y, z} has exactly one vertex with two out-edges
under a total-order orientation, so each is counted exactly once.

At 100 TB the only all-to-all exchanges are keyed by node id / edge
pair — raw payloads never shuffle. Reference repo has no graph ops;
this is part of the from-scratch LLM-curation surface (SURVEY §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import bucketed_map_groups, global_agg, grouped_agg
from .relational import hash_join


def _canonical_edges(edges_ds, src_col: str, dst_col: str):
    """Distinct undirected edges as (lo, hi) with lo < hi; self-loops drop."""

    def canon(b: pa.Table) -> pa.Table:
        s = b[src_col].to_numpy(zero_copy_only=False)
        d = b[dst_col].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})

    canon_ds = edges_ds.map_batches(canon, batch_format="pyarrow")
    # repartition: grouped_agg emits schema-less zero-row blocks for
    # empty buckets and pyarrow hash joins reject them (repo landmine)
    return (
        grouped_agg(canon_ds, ["lo", "hi"], {"_m": (None, "count")})
        .drop_columns(["_m"])
        .repartition(4)
    )


def triangle_count(edges_ds, src_col: str = "src", dst_col: str = "dst"):
    """Exact global triangle count over an undirected edge Dataset.

    Returns a 1-row pandas DataFrame ``(n_nodes, n_edges,
    n_triangles)`` — all int64, so the whole computation is
    SQL-reproducible (the oracle enumerates id-ordered triangles via
    a 3-way self-join; orientation choice does not change the count).
    """
    edges = _canonical_edges(edges_ds, src_col, dst_col).materialize()
    if edges.count() == 0:
        # all input edges were self-loops (or the input was empty):
        # the downstream hash joins reject schema-less empty blocks
        # (repo landmine), and the answer is trivially all-zero.
        return pd.DataFrame(
            {
                "n_nodes": pd.array([0], dtype="int64"),
                "n_edges": pd.array([0], dtype="int64"),
                "n_triangles": pd.array([0], dtype="int64"),
            }
        )

    def explode(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays([b["lo"].combine_chunks(), b["hi"].combine_chunks()])}
        )

    deg = grouped_agg(
        edges.map_batches(explode, batch_format="pyarrow"),
        ["node"],
        {"deg": (None, "count")},
    ).repartition(4)

    n_nodes = deg.count()
    n_edges = edges.count()

    # attach deg to both endpoints (deg table is |V| rows, distributed)
    def rename(frm: dict[str, str]):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns([frm.get(c, c) for c in b.column_names])

        return f

    deg_lo = deg.map_batches(rename({"node": "lo", "deg": "deg_lo"}), batch_format="pyarrow")
    deg_hi = deg.map_batches(rename({"node": "hi", "deg": "deg_hi"}), batch_format="pyarrow")
    # repartition between the chained joins: the first join's empty
    # partitions emit zero-column blocks the second join's acero
    # cannot take (see hash_join docstring); the exchange rebuilds
    # every block with the unified schema. Cost: one extra exchange
    # of the (lo, hi, deg_lo) edge table.
    from .relational import join_partitions_for

    with_deg = hash_join(
        hash_join(edges, deg_lo, on="lo").repartition(
            join_partitions_for(edges, deg)
        ),
        deg_hi,
        on="hi",
    )

    # orient from (deg, id)-smaller to larger endpoint
    def orient(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        dl = b["deg_lo"].to_numpy(zero_copy_only=False)
        dh = b["deg_hi"].to_numpy(zero_copy_only=False)
        fwd = (dl < dh) | ((dl == dh) & (lo < hi))
        return pa.table(
            {
                "a": pa.array(np.where(fwd, lo, hi)),
                "b": pa.array(np.where(fwd, hi, lo)),
                "deg_b": pa.array(np.where(fwd, dh, dl)),
            }
        )

    oriented = with_deg.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges per source: candidate closures (b, c), k(b) < k(c)
    def wedges(g: pd.DataFrame) -> pd.DataFrame | None:
        if len(g) < 2:
            return None
        order = np.lexsort((g["b"].to_numpy(), g["deg_b"].to_numpy()))
        nb = g["b"].to_numpy()[order]
        n = len(nb)
        ii, jj = np.triu_indices(n, k=1)
        return pd.DataFrame({"x": nb[ii], "y": nb[jj]})

    cand = grouped_agg(
        bucketed_map_groups(oriented, ["a"], wedges),
        ["x", "y"],
        {"m": (None, "count")},
    ).materialize()
    if cand.count() == 0:
        # no node has two out-edges -> no wedges -> no triangles; the
        # presence-tagged union below cannot take a schema-less empty
        # side (repo landmine), so answer directly.
        return pd.DataFrame(
            {
                "n_nodes": pd.array([n_nodes], dtype="int64"),
                "n_edges": pd.array([n_edges], dtype="int64"),
                "n_triangles": pd.array([0], dtype="int64"),
            }
        )

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": b["a"],
                "y": b["b"],
                "m": pa.array(np.zeros(len(b), dtype=np.int64)),
                "is_edge": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )

    def tag_cand(b: pa.Table) -> pa.Table:
        return b.append_column("is_edge", pa.array(np.zeros(len(b), dtype=np.int64)))

    tagged = cand.map_batches(tag_cand, batch_format="pyarrow").union(
        oriented.map_batches(tag_edges, batch_format="pyarrow")
    )
    per_pair = grouped_agg(
        tagged, ["x", "y"], {"m": ("m", "sum"), "is_edge": ("is_edge", "max")}
    )

    def closed(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy(zero_copy_only=False)
        e = b["is_edge"].to_numpy(zero_copy_only=False)
        return pa.table({"tri": pa.array((m * e).astype(np.int64))})

    total = global_agg(
        per_pair.map_batches(closed, batch_format="pyarrow"), {"tri": ("tri", "sum")}
    )
    return pd.DataFrame(
        {
            "n_nodes": pd.array([n_nodes], dtype="int64"),
            "n_edges": pd.array([n_edges], dtype="int64"),
            "n_triangles": pd.array([int(total["tri"])], dtype="int64"),
        }
    )
