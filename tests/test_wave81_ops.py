"""Wave-81: l-diversity audit and randomized-response frequency
estimation — mechanism arithmetic on hand-built inputs."""

import hashlib
import importlib.util

import duckdb


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w81", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_l_diversity_oracle_and_bounds():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["l_diversity_audit"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ref = con.execute(m.oracle_sql()["l_diversity_audit"]).fetchdf()
    for c in ("n_cells", "min_l", "cells_below_l10", "events_low_ppm"):
        assert int(got[c].iloc[0]) == int(ref[c].iloc[0]), c
    assert 0 < int(got["min_l"].iloc[0])
    assert 0 <= int(got["events_low_ppm"].iloc[0]) <= 1_000_000


def test_randomized_response_estimator_inverts():
    """The RR share estimate must recover the true share within the
    mechanism's sampling error, and the reported counts must conserve
    the total (every event reports exactly one type)."""
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["randomized_response_counts"](sf)
    n = int(got["n_true"].sum())
    assert int(got["n_reported"].sum()) == n
    # unbiasedness sanity: estimate within 10 percentage points of
    # truth on every type at this n (mechanism noise is ~1/sqrt(n))
    for _, r in got.iterrows():
        assert abs(int(r["est_share_ppm"]) - int(r["true_share_ppm"])) < 100_000

    # keep/replace split matches the md5 rule on a spot sample
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf}/events.parquet", columns=["event_id"])[
        "event_id"
    ].to_pylist()[:100]
    kept = sum(
        1
        for i in ids
        if int(hashlib.md5(f"rr:{i}".encode()).hexdigest()[:16], 16) % 4 < 3
    )
    assert 50 <= kept <= 100  # ~75% keep rate
