"""Range-partition planning — the plan step of every distributed
range-sort / range-partitioned write (Spark's RangePartitioner, Ray
Data's sort boundary sampling), made EXACT and SQL-replayable.

Two passes over the source (the canonical plan-then-apply shape):
1. boundary pass — exact discrete quantiles at k/K via the
   value-counts combiner (ops/sketch.py): the shuffle moves only
   per-block distinct-value partials, never rows;
2. assignment pass — a stateless vectorized map tags each row with
   ``pid = #(boundaries < v)`` (np.searchsorted against the K−1
   boundary values held in the task closure — K is tiny, no
   broadcast machinery needed), folded to per-partition
   (n_rows, min_v, max_v) by one combiner.

Production sorters sample instead of exact-quantile when |distinct|
is unbounded; this op's contract is the same as
value_counts_quantiles — discrete/integer-scaled keys. The output IS
the balance audit a 100 TB range-write needs before launching: a
skewed plan shows up as one pid holding the duplicate-heavy run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def range_partition_plan(ds, col: str, num_partitions: int = 8):
    """Per-partition (pid, n_rows, min_v, max_v) for an exact
    K-quantile range partitioning of integer column ``col``.
    ``ds`` is scanned twice (plan + apply); callers at scale should
    pass a pruned parquet read so both passes stream."""
    from .agg import grouped_agg
    from .sketch import value_counts_quantiles

    qs = [k / num_partitions for k in range(1, num_partitions)]
    bdf = value_counts_quantiles(ds, col, qs)
    boundaries = np.sort(bdf["value"].to_numpy().astype(np.int64))

    def assign(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = np.searchsorted(boundaries, v, side="left").astype(np.int64)
        return pa.table({"pid": pa.array(pid), "v": pa.array(v)})

    stats = grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["pid"],
        {
            "n_rows": (None, "count"),
            "min_v": ("v", "min"),
            "max_v": ("v", "max"),
        },
    ).to_pandas()
    stats = stats.sort_values("pid").reset_index(drop=True)
    for c in stats.columns:
        stats[c] = stats[c].astype("int64")
    return stats


def range_partition_plan_sql(
    source_expr: str, num_partitions: int = 8
) -> str:
    """The DuckDB mirror: ``source_expr`` must select one BIGINT
    column ``v``. quantile_disc rank arithmetic matches
    value_counts_quantiles exactly (shared discipline with the
    quantile oracles)."""
    ks = range(1, num_partitions)
    bcols = ", ".join(
        f"quantile_disc(v, {k / num_partitions!r}) AS b{k}" for k in ks
    )
    pid = " + ".join(f"(CASE WHEN v > b{k} THEN 1 ELSE 0 END)" for k in ks)
    return f"""
        WITH c AS ({source_expr}),
        b AS (SELECT {bcols} FROM c),
        a AS (SELECT {pid} AS pid, v FROM c CROSS JOIN b)
        SELECT CAST(pid AS BIGINT) AS pid,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(v) AS BIGINT) AS min_v,
               CAST(max(v) AS BIGINT) AS max_v
        FROM a GROUP BY pid
    """
