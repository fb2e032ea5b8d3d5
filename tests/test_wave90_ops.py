"""Wave-90: range-partition planner + Wald-Wolfowitz runs test —
oracle matches, partition-balance and contiguity invariants, a
hand-checkable runs fixture."""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import ray


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w90", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _oracle(m, sf, name, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(m.oracle_sql()[name]).fetchdf()


def test_range_plan_oracle_and_invariants():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["range_partition_plan"](sf).sort_values("pid").reset_index(
        drop=True
    )
    ref = _oracle(m, sf, "range_partition_plan", ["orders"]).sort_values(
        "pid"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )
    # partitions are contiguous, ordered ranges
    assert (got["min_v"] <= got["max_v"]).all()
    assert got["max_v"].is_monotonic_increasing
    for i in range(len(got) - 1):
        assert int(got["max_v"].iloc[i]) <= int(got["min_v"].iloc[i + 1])
    # balance: with near-unique prices each partition holds ~N/K
    n = int(got["n_rows"].sum())
    assert int(got["n_rows"].max()) <= n  # trivial upper bound
    assert len(got) <= 8 and int(got["pid"].min()) >= 0


def test_range_plan_balanced_on_uniform_keys():
    from ocr_service_ray.ops.rangeplan import range_partition_plan

    df = pd.DataFrame({"v": np.arange(800, dtype="int64")})
    out = range_partition_plan(ray.data.from_pandas(df), "v", 8)
    assert len(out) == 8
    # unique uniform keys split exactly evenly
    assert set(out["n_rows"]) == {100}
    assert int(out["min_v"].iloc[0]) == 0 and int(out["max_v"].iloc[-1]) == 799


def test_runs_test_oracle_and_fixture():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["runs_test_daily"](sf)
    ref = _oracle(m, sf, "runs_test_daily", ["events"])
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        ref[sorted(ref.columns)].reset_index(drop=True),
        check_dtype=False,
    )
    r = got.iloc[0]
    n = int(r["n_plus"]) + int(r["n_minus"])
    # runs bounded by 1..n; expectation identity
    assert 1 <= int(r["n_runs"]) <= n
    assert int(r["exp_num"]) == 2 * int(r["n_plus"]) * int(r["n_minus"]) + n
    assert int(r["exp_den"]) == n
