"""Data-contract validation — declarative constraint checks that fold
to a (rule, n_violations) report.

The dbt-test / Great-Expectations shape as one streaming pass:
each rule is vectorized per block into a violation count, counts fold
in the partial, and only |rules| integers reach the driver. ``unique``
needs distinct counting and runs as a combiner distinct-count (value
hashes shuffle once); everything else is block-local.

Rules are declarative tuples so the same spec is trivially mirrored
as SQL count expressions:

    ("not_null", col)           — NULL values
    ("non_negative", col)       — values < 0
    ("in_set", col, values)     — values outside the set
    ("unique", col)             — n_rows - n_distinct (NULLs count rows)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .agg import global_agg, grouped_agg


def validate_constraints(ds, rules: list[tuple]) -> pd.DataFrame:
    """Returns (rule, n_violations) int64 rows, one per rule, in rule
    order. A passing contract is all-zeros — assert on it in CI."""
    block_rules = [r for r in rules if r[0] != "unique"]
    unique_rules = [r for r in rules if r[0] == "unique"]

    def counts(b: pa.Table) -> pa.Table:
        row = {}
        for r in block_rules:
            kind, col = r[0], r[1]
            if kind == "not_null":
                n = len(b) - pc.sum(pc.is_valid(b[col]).cast(pa.int64())).as_py()
            elif kind == "non_negative":
                valid = pc.drop_null(b[col])
                n = pc.sum(pc.less(valid, 0).cast(pa.int64())).as_py() or 0
            elif kind == "in_set":
                valid = pc.drop_null(b[col])
                n = len(valid) - (
                    pc.sum(pc.is_in(valid, value_set=pa.array(r[2])).cast(pa.int64())).as_py()
                    or 0
                )
            else:
                raise ValueError(f"unknown rule: {kind}")
            row[f"{kind}:{col}"] = [n]
        return pa.table(row)

    names, values = [], []
    if block_rules:
        partial = ds.map_batches(counts, batch_format="pyarrow")
        totals = global_agg(
            partial,
            {f"{r[0]}:{r[1]}": (f"{r[0]}:{r[1]}", "sum") for r in block_rules},
        )
    else:
        totals = {}
    for r in rules:
        name = f"{r[0]}:{r[1]}"
        if r[0] == "unique":
            n_rows = ds.count()
            n_distinct = grouped_agg(
                ds.select_columns([r[1]]), [r[1]], {"_c": (None, "count")}
            ).count()
            values.append(n_rows - n_distinct)
        else:
            values.append(int(totals[name]))
        names.append(name)
    return pd.DataFrame({"rule": names, "n_violations": values}).astype(
        {"n_violations": "int64"}
    )
