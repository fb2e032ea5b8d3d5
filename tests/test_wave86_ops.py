"""Wave-86: Kruskal-Wallis rank sums + degree assortativity —
oracle matches plus structural invariants (rank-sum identity,
assortativity bounds, constant-degree degeneracy)."""

import importlib.util

import duckdb
import numpy as np
import pandas as pd
import ray


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w86", "/root/repo/__ray_entry__.py"
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


def test_kruskal_rank_sums_oracle_and_identity():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["kruskal_rank_sums"](sf)
    ref = _oracle(m, sf, "kruskal_rank_sums", ["events"])
    g = got.sort_values("event_type").reset_index(drop=True)
    r = ref.sort_values("event_type").reset_index(drop=True)
    assert list(g.columns) == sorted(g.columns) or set(g.columns) == set(r.columns)
    pd.testing.assert_frame_equal(
        g[sorted(g.columns)], r[sorted(r.columns)], check_dtype=False
    )
    # rank-sum identity: sum of all 2·R_g equals N(N+1)
    n_total = int(g["n_total"].iloc[0])
    assert int(g["r2"].sum()) == n_total * (n_total + 1)
    assert int(g["n"].sum()) == n_total


def test_degree_assortativity_oracle():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["degree_assortativity"](sf)
    ref = _oracle(m, sf, "degree_assortativity", ["orders", "lineitem"])
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        ref[sorted(ref.columns)].reset_index(drop=True),
        check_dtype=False,
    )
    r = got.iloc[0]
    # |r| <= 1 so signed square in micro is within [-1e6, 1e6]
    assert -1_000_000 <= int(r["r2_sign_micro"]) <= 1_000_000
    assert int(r["n_edges"]) > 0


def test_degree_assortativity_star_and_constant():
    # star graph 0->{1..4}: deg_x constant (4 edges from one src),
    # deg_y constant 1 -> both variances zero -> r2_sign_micro 0
    from ocr_service_ray.ops.assortativity import degree_assortativity

    edges = ray.data.from_pandas(
        pd.DataFrame({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    )
    out = degree_assortativity(edges)
    r = out.iloc[0]
    assert int(r["n_edges"]) == 4
    assert int(r["varx_num"]) == 0 and int(r["vary_num"]) == 0
    assert int(r["r2_sign_micro"]) == 0

    # perfect positive association: two disjoint complete bipartite
    # blocks of different size -> x == y on every edge -> r = 1
    rows = []
    for a in range(2):
        for b in range(2):
            rows.append((f"a{a}", f"b{b}"))
    for a in range(3):
        for b in range(3):
            rows.append((f"c{a}", f"d{b}"))
    df = pd.DataFrame(rows, columns=["src", "dst"])
    out2 = degree_assortativity(ray.data.from_pandas(df))
    assert int(out2.iloc[0]["r2_sign_micro"]) == 1_000_000

    # duplicate edge rows collapse: duplicating every edge changes nothing
    out3 = degree_assortativity(ray.data.from_pandas(pd.concat([df, df])))
    pd.testing.assert_frame_equal(out2, out3)
