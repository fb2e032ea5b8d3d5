"""Wave-7 ops: k-core peeling, degree histogram, rolling z-score
outliers, vocabulary overlap matrix — vs brute-force references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _peel_ref(edges, k):
    e = pd.DataFrame(edges, columns=["lo", "hi"])
    e = e[e.lo != e.hi]
    e[["lo", "hi"]] = np.sort(e[["lo", "hi"]].to_numpy(), axis=1)
    e = e.drop_duplicates()
    while True:
        deg = pd.concat([e.lo, e.hi]).value_counts()
        keep = set(deg[deg >= k].index)
        ne = e[e.lo.isin(keep) & e.hi.isin(keep)]
        if len(ne) == len(e):
            break
        e = ne
    deg = pd.concat([e.lo, e.hi]).value_counts()
    return {n: int(d) for n, d in deg.items() if d >= k}


def test_kcore_peel_matches_reference(ray_session):
    from ocr_service_ray.ops.kcore import kcore_peel

    rng = np.random.RandomState(31)
    edges = list(zip(rng.randint(0, 30, 500).tolist(), rng.randint(0, 30, 500).tolist()))
    out = kcore_peel(
        _ds({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}),
        k=8,
        rounds=8,
    ).to_pandas()
    ref = _peel_ref(edges, 8)
    got = dict(zip(out["node"], out["deg"].astype(int)))
    assert got == ref
    assert len(ref) > 0  # non-trivial core at these parameters


def test_kcore_peel_empty_core(ray_session):
    from ocr_service_ray.ops.kcore import kcore_peel

    # a path graph has no 2-core
    out = kcore_peel(
        _ds({"src": [1, 2, 3], "dst": [2, 3, 4]}), k=2, rounds=4
    ).to_pandas()
    assert len(out) == 0


def test_degree_histogram(ray_session):
    from ocr_service_ray.ops.kcore import degree_histogram

    # triangle + pendant: degrees 2,2,3,1
    out = (
        degree_histogram(_ds({"src": [1, 2, 3, 3], "dst": [2, 3, 1, 4]}))
        .to_pandas()
        .set_index("deg")["n_nodes"]
    )
    assert out.to_dict() == {1: 1, 2: 2, 3: 1}


def test_rolling_zscore_outliers(ray_session):
    from ocr_service_ray.ops.rolling import rolling_zscore_outliers

    v = [10, 11, 10, 9, 10, 11, 500, 10, 11, 10]
    df = {
        "k": [1] * 10,
        "i": list(range(10)),
        "v": v,
    }
    out = (
        rolling_zscore_outliers(
            _ds(df), "k", ["i"], "v", "i", window=5, k_num=3, k_den=1
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # the 500 spike must be flagged, the flat head must not
    assert out.loc[6, "is_outlier"] == 1
    assert out.loc[:5, "is_outlier"].sum() == 0
    # integer rule equals the float z-score rule over the PRIOR window
    s = pd.Series(v)
    roll_m = s.rolling(5, min_periods=1).mean().shift(1)
    roll_q = (s * s).rolling(5, min_periods=1).mean().shift(1)
    var = roll_q - roll_m**2
    n = s.rolling(5, min_periods=1).count().shift(1, fill_value=0)
    z2 = (s - roll_m) ** 2 / var.replace(0, np.nan)
    expect = ((z2 > 9) & (n >= 3)).fillna(False).astype(int)
    assert out["is_outlier"].tolist() == expect.tolist()


def test_vocab_overlap_matrix(ray_session):
    from ocr_service_ray.ops.overlap import vocab_overlap_matrix

    docs = {
        "source": ["a", "a", "b", "c"],
        "text": ["x y z", "z w", "y z q", "unique only"],
    }
    out = vocab_overlap_matrix(_ds(docs)).set_index(["src_a", "src_b"])
    va, vb, vc = {"x", "y", "z", "w"}, {"y", "z", "q"}, {"unique", "only"}
    ab = out.loc[("a", "b")]
    assert ab["n_shared"] == len(va & vb)
    assert ab["n_a"] == len(va) and ab["n_b"] == len(vb)
    assert ab["jaccard_ppm"] == len(va & vb) * 1_000_000 // len(va | vb)
    # disjoint pair emits no row (no shared token)
    assert ("a", "c") not in out.index
