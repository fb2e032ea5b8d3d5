"""Wave-82: expected calibration error and Cohen's kappa — metric
arithmetic identities on sf0.001, plus closed-form checks."""

import importlib.util

import duckdb
import numpy as np


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w82", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_quality_ece_telescoping_identity():
    """ECE computed from the per-bin output columns must equal the
    reported ece_ppm (the telescoped |1e6·pos − sum_score|/N form),
    and the oracle must agree."""
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["quality_ece"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(m.oracle_sql()["quality_ece"]).fetchdf()
    assert got.values.tolist() == ref.values.tolist()
    # per-bin conf/acc are bounded ppm values
    assert (got["conf_ppm"].between(0, 1_000_000)).all()
    assert (got["acc_ppm"].between(0, 1_000_000)).all()
    # recompute ECE from per-bin aggregates: sum n_b*|acc-conf| / N
    # differs from the exact telescoped value only by per-bin floor
    # rounding, so it must be within n_bins of ece_ppm
    n = got["n_docs"].to_numpy()
    approx = int((n * np.abs(got["acc_ppm"] - got["conf_ppm"])).sum() // n.sum())
    assert abs(approx - int(got["ece_ppm"].iloc[0])) <= len(got)


def test_langid_kappa_bounds_and_degenerate():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["langid_kappa"](sf)
    r = got.iloc[0]
    assert 0 <= r["accuracy_ppm"] <= 1_000_000
    assert 0 <= r["expected_agree_ppm"] <= 1_000_000
    assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000
    # kappa <= accuracy rescaled: kappa = (po-pe)/(1-pe) <= po when pe>=0
    assert r["kappa_ppm"] <= r["accuracy_ppm"] + 1
    # perfect-agreement closed form: if agree == n, kappa == 1e6
    n, agree = int(r["n_docs"]), int(r["n_agree"])
    if agree == n:
        assert int(r["kappa_ppm"]) == 1_000_000
