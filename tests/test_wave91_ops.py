"""Wave-91: composed entity resolution + median-of-means — oracle
matches, cluster-label invariants, a hand-built resolution fixture."""

import importlib.util

import duckdb
import pandas as pd


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w91", "/root/repo/__ray_entry__.py"
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


def test_resolve_parts_oracle_and_labels():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["resolve_parts"](sf).to_pandas()
    ref = _oracle(m, sf, "resolve_parts", ["part"])
    g = got[sorted(got.columns)].sort_values("p_partkey").reset_index(drop=True)
    r = ref[sorted(ref.columns)].sort_values("p_partkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, r, check_dtype=False)
    # canonical labels are cluster minima: every label is a member of
    # its own cluster and labels itself
    lab = dict(zip(g["p_partkey"], g["canonical_key"]))
    for k, c in lab.items():
        assert c <= k
        assert lab.get(c, c) == c
    # at least one nontrivial merge exists in the fixture data
    assert (g["canonical_key"] != g["p_partkey"]).any()


def test_median_of_means_oracle_and_bounds():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["median_of_means_value"](sf)
    ref = _oracle(m, sf, "median_of_means_value", ["events"])
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        ref[sorted(ref.columns)].reset_index(drop=True),
        check_dtype=False,
    )
    r = got.iloc[0]
    assert 0 <= int(r["median_bucket"]) < 16
    assert int(r["mom_den"]) > 0
    # MoM estimate must sit inside the raw value range (0..~330 -> cents)
    est = int(r["mom_num"]) / int(r["mom_den"])
    assert 0 < est < 100_000
