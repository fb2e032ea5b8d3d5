"""k-core decomposition (fixed-round peeling) and degree histograms.

``kcore_peel`` runs exactly ``rounds`` peeling rounds: each round
computes degrees over the surviving edge set and drops every node
with degree < k, then filters edges to surviving endpoints. With
``rounds`` >= the graph's peeling depth this is the EXACT k-core
(extra rounds are no-ops at the fixpoint); fixing the round count is
what makes the whole computation SQL-unrollable as chained CTEs —
the same discipline as ``pagerank_int`` (ops/graph.py). Callers pick
``rounds`` from a convergence probe at small scale or over-provision
(each no-op round costs one degree aggregate + two joins).

Per round: one combiner degree count (|V| rows), two hash joins
keyed by node id to filter edges — raw payloads never move, only
(node, degree) integers. Loop-carried edge sets are materialized and
repartitioned per the repo-wide join-input contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import grouped_agg
from .relational import hash_join
from .triangles import _canonical_edges


def _degrees(edges):
    def explode(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [b["lo"].combine_chunks(), b["hi"].combine_chunks()]
                )
            }
        )

    return grouped_agg(
        edges.map_batches(explode, batch_format="pyarrow"),
        ["node"],
        {"deg": (None, "count")},
    ).repartition(4)


def degree_histogram(edges_ds, src_col: str = "src", dst_col: str = "dst"):
    """(degree, n_nodes) over the canonical undirected graph — the
    cheapest skew diagnostic before any graph workload. Two combiner
    aggregates, nothing driver-side."""
    edges = _canonical_edges(edges_ds, src_col, dst_col)
    return grouped_agg(_degrees(edges), ["deg"], {"n_nodes": (None, "count")})


def kcore_peel(
    edges_ds,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
):
    """Surviving (node, degree) rows of the k-core after ``rounds``
    peeling rounds (exact k-core when rounds >= peeling depth)."""
    edges = _canonical_edges(edges_ds, src_col, dst_col).materialize()

    def keep_of(deg):
        def f(b: pa.Table) -> pa.Table:
            m = b["deg"].to_numpy(zero_copy_only=False) >= k
            return pa.table({"node": b["node"].filter(pa.array(m))})

        return deg.map_batches(f, batch_format="pyarrow").repartition(4)

    def rename_to(col: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns([col])

        return f

    def _empty_result():
        import ray.data as rd

        node_t = edges.schema(fetch_if_missing=False).base_schema.field("lo").type
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], type=node_t), "deg": pa.array([], type=pa.int64())}
            )
        )

    for _ in range(rounds):
        keep = keep_of(_degrees(edges)).materialize()
        # a fully-peeled graph leaves a schema-less empty keep set the
        # pyarrow join cannot key on — the core is empty, stop here
        if keep.count() == 0:
            return _empty_result()
        lo_keep = keep.map_batches(rename_to("lo"), batch_format="pyarrow")
        hi_keep = keep.map_batches(rename_to("hi"), batch_format="pyarrow")
        edges = (
            hash_join(hash_join(edges, lo_keep, on="lo"), hi_keep, on="hi")
            .repartition(4)
            .materialize()
        )
        if edges.count() == 0:
            return _empty_result()

    final = _degrees(edges)

    def keep_rows(b: pa.Table) -> pa.Table:
        m = b["deg"].to_numpy(zero_copy_only=False) >= k
        return b.filter(pa.array(m))

    return final.map_batches(keep_rows, batch_format="pyarrow")
