"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf and compare row-count + schema + values
against oracle_sql() via DuckDB (order-insensitive).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    df = result.to_pandas()  # ray Dataset
    if df.shape[1] == 0:
        # Ray's to_pandas() drops the columns of an ALL-EMPTY dataset
        # even when the plan schema is known (zero-row landmine, this
        # time on the consumption side) — rebuild the empty frame from
        # Dataset.schema() so a legitimately empty result still
        # carries its declared columns into the oracle compare
        sch = result.schema()
        if sch is not None and getattr(sch, "names", None):
            df = pd.DataFrame(
                {
                    n: pd.Series(dtype=t.to_pandas_dtype())
                    if isinstance(t, pa.DataType)
                    else pd.Series(dtype=t)
                    for n, t in zip(sch.names, sch.types)
                }
            )
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            # nullable Int64 with NA can't cast to int64 — compare as
            # float (exact for the < 2^53 ints the queries emit)
            if df[c].isna().any():
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_object_dtype(df[c]) or isinstance(
            df[c].dtype, pd.CategoricalDtype
        ):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
        return problems
    if len(ray_df) == 0:
        # both empty with matching column names: vacuously equal —
        # empty-frame dtype artifacts (object vs int64 on a column
        # that never held a value) are not content differences
        return problems
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=0, equal_nan=True)
        else:
            ok = a[c].equals(b[c])
        if not ok:
            bad = (a[c] != b[c]).to_numpy().nonzero()[0][:3]
            problems.append(
                f"col {c}: first diffs at rows {bad.tolist()}: "
                f"ray={a[c].iloc[bad].tolist()} sql={b[c].iloc[bad].tolist()}"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    # Cap the ORACLE's appetite: a pathological oracle plan (e.g. a
    # quadratic recursive CTE at sf0.1) must fail fast with a resource
    # error, not spill tens of GB of temp and take the whole sweep
    # process down with "No space left on device" (observed r5).
    con.execute("SET memory_limit='24GB'")
    con.execute("SET max_temp_directory_size='20GB'")
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name in oracles:
            try:
                sql_df = con.execute(oracles[name]).fetchdf()
            except Exception as e:
                # an ORACLE-side resource failure is a triage item for
                # the sweep notes, not an engine failure — record it
                # and keep sweeping (the Ray result already ran fine)
                failures += 1
                print(
                    f"FAIL {name} ({dt:.1f}s): oracle error "
                    f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
                )
                continue
            problems = compare(name, ray_df, sql_df)
            if problems:
                failures += 1
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            else:
                print(f"OK   {name} ({dt:.1f}s): {len(ray_df)} rows, oracle match")
        else:
            print(f"OK   {name} ({dt:.1f}s): {len(ray_df)} rows (rows-only, no oracle)")
        # drop the query's result references and collect so lingering
        # Datasets (and the actor pools they keep alive) are released
        # between queries — hygiene for long multi-query sessions
        import gc

        ray_df = sql_df = None
        gc.collect()
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
