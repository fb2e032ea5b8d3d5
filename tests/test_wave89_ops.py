"""Wave-89: CUPED moments + t-closeness EMD audit — oracle matches
plus variance-reduction sanity and EMD bounds."""

import importlib.util
from fractions import Fraction

import duckdb
import pandas as pd


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w89", "/root/repo/__ray_entry__.py"
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


def test_cuped_oracle_and_theta_shape():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["cuped_moments"](sf).sort_values("arm").reset_index(drop=True)
    ref = _oracle(m, sf, "cuped_moments", ["events"]).sort_values(
        "arm"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )
    assert set(got["arm"]) == {0, 1}
    # pooled variance numerator must be positive on real data
    assert int(got["theta_den"].iloc[0]) > 0
    # theta = cov/var is a sane magnitude (|theta| < 100)
    th = Fraction(int(got["theta_num"].iloc[0]), int(got["theta_den"].iloc[0]))
    assert abs(th) < 100
    # adjusted diff equals raw diff when theta term removed only if
    # pre-period is balanced; just check it is finite & consistent
    assert got["adj_diff_microcents"].nunique() == 1


def test_t_closeness_oracle_and_bounds():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["t_closeness_audit"](sf)
    ref = _oracle(m, sf, "t_closeness_audit", ["orders"])
    g = got.sort_values("o_orderpriority").reset_index(drop=True)
    r = ref.sort_values("o_orderpriority").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[sorted(g.columns)], r[sorted(r.columns)], check_dtype=False
    )
    # EMD in [0, 1]: num <= den, both positive den
    assert (g["emd_num"] >= 0).all()
    assert (g["emd_num"] <= g["emd_den"]).all()
    # a group identical to the corpus would give 0; the whole-corpus
    # union of groups must reconstruct total counts
    n_total = int(g["emd_den"].iloc[0]) // (int(g["n_g"].iloc[0]) * 9)
    assert int(g["n_g"].sum()) == n_total
