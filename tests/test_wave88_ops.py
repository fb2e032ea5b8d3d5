"""Wave-88: readability rationals + consonant-skeleton blocking —
oracle matches, formula invariants, skeleton parity on edge strings."""

import importlib.util

import duckdb
import pandas as pd
import pyarrow as pa
import ray


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w88", "/root/repo/__ray_entry__.py"
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


def _cmp(got, ref, keys):
    g = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    g = g[sorted(g.columns)].sort_values(keys).reset_index(drop=True)
    r = ref[sorted(ref.columns)].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, r, check_dtype=False)
    return g


def test_readability_oracle_and_formula():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["readability_scores"](sf)
    ref = _oracle(m, sf, "readability_scores", ["documents"])
    g = _cmp(got, ref, ["doc_id"])
    # den = S*W, and num/den stays in a plausible Flesch band
    assert (g["flesch_den"] == g["n_sentences"] * g["n_words"]).all()
    ratio = g["flesch_num"] / (1000.0 * g["flesch_den"])
    assert (ratio <= 206.835).all()
    # guards: S, W >= 1 everywhere
    assert (g["n_sentences"] >= 1).all() and (g["n_words"] >= 1).all()


def test_phonetic_blocking_oracle():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["phonetic_blocking"](sf)
    ref = _oracle(m, sf, "phonetic_blocking", ["part"])
    g = _cmp(got, ref, ["skeleton"])
    assert (g["n_members"] >= 2).all()
    assert (g["n_pairs"] == g["n_members"] * (g["n_members"] - 1) // 2).all()


def test_skeleton_edge_parity():
    from ocr_service_ray.ops.phonetic import skeleton_array, skeleton_sql

    cases = [
        "Robert", "Rupert", "rob ert!!", "AEIOUY", "", "123",
        "Mississippi", "bbbb", "Schwarzenegger", "naïve café",
    ]
    arrow = skeleton_array(pa.array(cases)).to_pylist()
    con = duckdb.connect()
    sql = [
        con.execute(f"SELECT {skeleton_sql('?')}", [c]).fetchone()[0]
        for c in cases
    ]
    assert arrow == sql
    # doubled letters and vowels collapse identically
    assert arrow[cases.index("Robert")] == arrow[cases.index("rob ert!!")]
    assert arrow[cases.index("AEIOUY")] == ""


def test_blocking_stats_duplicates_block_together():
    from ocr_service_ray.ops.phonetic import blocking_stats

    df = pd.DataFrame(
        {"name": ["Robert", "robbert", "ROBERT!", "zz top", "solo"]}
    )
    out = blocking_stats(ray.data.from_pandas(df), "name")
    # Robert / robbert / ROBERT! share skeleton 'rbrt'
    row = out[out["skeleton"] == "rbrt"]
    assert len(row) == 1 and int(row["n_members"].iloc[0]) == 3
    assert int(row["n_pairs"].iloc[0]) == 3
    # singleton blocks are dropped
    assert "sl" not in set(out["skeleton"])
