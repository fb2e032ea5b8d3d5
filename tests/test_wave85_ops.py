"""Wave-85: Bloom-filter FPR audit — no false negatives by
construction, fpr near the analytic expectation, oracle match."""

import importlib.util

import duckdb
import numpy as np


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w85", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_bloom_fpr_oracle_and_analytic_band():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["bloom_fpr_audit"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    ref = con.execute(m.oracle_sql()["bloom_fpr_audit"]).fetchdf()
    assert got.values.tolist() == ref.values.tolist()
    r = got.iloc[0]
    # set bits can't exceed 3 insertions per member or the bitmap size
    assert 0 < int(r["n_set_bits"]) <= min(65536, 3 * int(r["n_members"]))
    # observed fpr should sit near the analytic (n_set/m)^3 expectation
    load = int(r["n_set_bits"]) / 65536.0
    expect_ppm = int(load**3 * 1_000_000)
    got_ppm = int(r["fpr_ppm"])
    # generous band: within 4x either way or both tiny (sparse filter)
    if expect_ppm >= 500:
        assert got_ppm <= 4 * expect_ppm + 1000
        assert 4 * got_ppm + 1000 >= expect_ppm
    assert 0 <= got_ppm <= 1_000_000
