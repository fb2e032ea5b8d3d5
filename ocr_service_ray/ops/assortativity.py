"""Degree assortativity of an edge set — the Pearson correlation of
endpoint degrees over edges, emitted as exact integer sufficient
statistics (the ops/stats.py comoments discipline applied to a graph).

Given a (directed / bipartite) edge table, the op computes

    x(e) = out-degree of src(e)   (distinct dst per src)
    y(e) = in-degree of dst(e)    (distinct src per dst)

and folds one pass of integer moments over the distinct-edge set:
``n, sx, sy, sxx, syy, sxy`` plus the derived cross-multiplied
numerators ``cov_num = n*sxy - sx*sy``, ``varx_num = n*sxx - sx*sx``,
``vary_num = n*syy - sy*sy`` and a signed squared-correlation
``r2_sign_micro = sign(cov) * floor(1e6 * cov^2 / (varx*vary))``
(Python bigints on the driver; HUGEINT in the DuckDB oracle — the
square of an int64-bounded covariance needs 128 bits). Assortativity
itself (Newman 2002, eq. 4 restricted to the directed/bipartite
variant) is ``cov / sqrt(varx*vary)``; the emitted signed square is
IEEE-free and bit-exact cross-engine.

Distributed shape (100 TB honest):
1. one combiner agg dedups edges — raw rows shuffle once, keyed by
   (src, dst);
2. two combiner aggs produce the degree tables (|V| rows each, stays
   distributed);
3. two hash joins attach deg(src) / deg(dst) to every edge (keyed
   exchanges; repartition interposed per the repo's empty-block
   landmine);
4. one vectorized map_batches + global_agg folds the six moments —
   only |blocks| partial rows reach the driver.

No counterpart in the reference repo (no graph ops there); part of
the from-scratch curation-analytics surface (SURVEY §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import global_agg, grouped_agg
from .relational import hash_join


def degree_assortativity(edges_ds, src_col: str = "src", dst_col: str = "dst"):
    """1-row DataFrame of exact integer assortativity statistics over
    the DISTINCT edge set of ``edges_ds`` (duplicate edge rows count
    once; self-loops are kept — callers with undirected semantics
    should canonicalize upstream)."""
    def _strip(b: pa.Table) -> pa.Table:
        # join-/pandas-originated blocks carry a schema-metadata dict;
        # the shuffle aggregator hashes schemas for dedup and logs
        # "Failed to hash the schemas" per reduce task otherwise
        return b.replace_schema_metadata(None)

    edges = (
        grouped_agg(
            edges_ds.map_batches(_strip, batch_format="pyarrow"),
            [src_col, dst_col],
            {"_m": (None, "count")},
        )
        .drop_columns(["_m"])
        .repartition(4)
        # split the DAG here: without this the full plan is a single
        # ~50-operator streaming DAG (upstream joins + two degree
        # aggregates + two more joins), and on a small cluster Ray
        # 2.49's executor intermittently admits NO task of it — every
        # operator idles at 0 tasks/0 actors (reproduced thrice at
        # the same suite position, never in isolation). The distinct
        # edge table is the natural cut point and is tiny relative
        # to the input (post-dedup).
        .materialize()
    )
    deg_src = grouped_agg(edges, [src_col], {"deg_x": (None, "count")}).repartition(4)
    deg_dst = grouped_agg(edges, [dst_col], {"deg_y": (None, "count")}).repartition(4)

    ej = hash_join(edges, deg_src, on=src_col).repartition(8)
    ej = hash_join(ej, deg_dst, on=dst_col).repartition(8)

    def moments(b: pa.Table) -> pa.Table:
        x = b["deg_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["deg_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    tot = global_agg(
        ej.map_batches(moments, batch_format="pyarrow"),
        {
            "n": ("n", "sum"),
            "sx": ("sx", "sum"),
            "sy": ("sy", "sum"),
            "sxx": ("sxx", "sum"),
            "syy": ("syy", "sum"),
            "sxy": ("sxy", "sum"),
        },
    )
    n = int(tot["n"])
    sx, sy = int(tot["sx"]), int(tot["sy"])
    sxx, syy, sxy = int(tot["sxx"]), int(tot["syy"]), int(tot["sxy"])
    cov_num = n * sxy - sx * sy
    varx_num = n * sxx - sx * sx
    vary_num = n * syy - sy * sy
    den = varx_num * vary_num  # Python bigint — may exceed int64
    if den > 0:
        r2 = (1_000_000 * cov_num * cov_num) // den
        r2_sign_micro = r2 if cov_num >= 0 else -r2
    else:
        r2_sign_micro = 0  # degenerate: a degree is constant
    return pd.DataFrame(
        {
            "n_edges": [n],
            "sx": [sx],
            "sy": [sy],
            "sxx": [sxx],
            "syy": [syy],
            "sxy": [sxy],
            "cov_num": [cov_num],
            "varx_num": [varx_num],
            "vary_num": [vary_num],
            "r2_sign_micro": [r2_sign_micro],
        }
    ).astype("int64")
