"""Wave-84: deterministic randomization test — draw arithmetic
(uint64 wraparound vs big-int mod 2^64), oracle match, p-value
consistency."""

import hashlib
import importlib.util

import duckdb
import numpy as np


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w84", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_uint64_mix_matches_bigint_mod():
    """numpy uint64 wraparound == (u*(2b+1)+b) mod 2^64 in exact
    integers — the contract that lets HUGEINT SQL replay the draws."""
    u = int(hashlib.md5(b"perm:12345").hexdigest()[:16], 16)
    for b in (0, 1, 7, 199):
        with np.errstate(over="ignore"):
            got = int(
                np.uint64(u) * np.uint64(2 * b + 1) + np.uint64(b)
            )
        assert got == (u * (2 * b + 1) + b) % (1 << 64)


def test_permutation_test_oracle_and_consistency():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["permutation_test_value"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ref = con.execute(m.oracle_sql()["permutation_test_value"]).fetchdf()
    assert got.values.tolist() == ref.values.tolist()
    r = got.iloc[0]
    assert 0 <= int(r["n_extreme"]) <= 200
    assert int(r["p_ppm"]) == (1_000_000 * (int(r["n_extreme"]) + 1)) // 201
    # a null-true reassignment scheme should rarely beat the observed
    # split by much: p must be a valid probability in ppm
    assert 0 < int(r["p_ppm"]) <= 1_000_000
