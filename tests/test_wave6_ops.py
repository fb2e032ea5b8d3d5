"""Wave-6 ops: exact-k md5-rank group sampling, T5 span corruption,
Hamilton proportional allocation sampling."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _md5_rank(salt, v):
    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)


def test_grouped_sample_k_exact_and_uniform(ray_session):
    from ocr_service_ray.ops.relational import grouped_sample_k

    g = ["a"] * 50 + ["b"] * 30 + ["c"] * 2
    ids = list(range(82))
    out = grouped_sample_k(_ds({"g": g, "id": ids}), ["g"], "id", 5).to_pandas()
    sizes = out.groupby("g")["id"].count()
    assert sizes["a"] == 5 and sizes["b"] == 5 and sizes["c"] == 2
    # matches the k smallest md5 ranks per group (not first-k)
    df = pd.DataFrame({"g": g, "id": ids})
    df["r"] = [_md5_rank("gsample", i) for i in ids]
    for grp, sub in df.groupby("g"):
        expect = set(sub.sort_values(["r", "id"]).head(5)["id"])
        assert set(out[out["g"] == grp]["id"]) == expect
    assert set(out[out["g"] == "a"]["id"]) != set(range(5))  # not head-k


def test_span_corruption(ray_session):
    from ocr_service_ray.ops.chunking import span_corruption

    out = (
        span_corruption(
            _ds({"doc_id": [1, 2], "text": ["t0 t1 t2 t3 t4 t5", "only two"]}),
            every=3,
            phase=1,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # positions 1, 4 masked
    assert out.loc[0, "corrupted"] == "t0 <mask> t2 t3 <mask> t5"
    assert out.loc[0, "target"] == "t1 t4"
    assert out.loc[0, "n_masked"] == 2
    assert out.loc[1, "corrupted"] == "only <mask>"
    assert out.loc[1, "target"] == "two"


def _hamilton(counts: dict, n: int) -> dict:
    total = sum(counts.values())
    ks = sorted(counts)
    base = {k: n * counts[k] // total for k in ks}
    rem = {k: n * counts[k] % total for k in ks}
    extras = n - sum(base.values())
    for k in sorted(ks, key=lambda k: (-rem[k], k))[:extras]:
        base[k] += 1
    return base


def test_proportional_sample_hamilton(ray_session):
    from ocr_service_ray.ops.mix import proportional_sample

    rng = np.random.RandomState(23)
    g = rng.choice(["web", "code", "books", "wiki"], 500, p=[0.6, 0.2, 0.15, 0.05])
    ids = np.arange(500)
    out = proportional_sample(
        _ds({"src": g.tolist(), "id": ids}), "src", "id", 97
    ).to_pandas()
    assert len(out) == 97
    counts = pd.Series(g).value_counts().to_dict()
    expect = _hamilton(counts, 97)
    got = out.groupby("src")["id"].count().to_dict()
    assert got == {k: v for k, v in expect.items() if v > 0}
    # each group's members are its quota-smallest md5 ranks
    df = pd.DataFrame({"src": g, "id": ids})
    df["r"] = [_md5_rank("mix", i) for i in ids]
    for grp, sub in df.groupby("src"):
        exp_ids = set(sub.sort_values(["r", "id"]).head(expect[grp])["id"])
        assert set(out[out["src"] == grp]["id"]) == exp_ids


def test_proportional_sample_rejects_overdraw(ray_session):
    from ocr_service_ray.ops.mix import proportional_sample

    with pytest.raises(ValueError):
        proportional_sample(
            _ds({"src": ["a", "b"], "id": [1, 2]}), "src", "id", 3
        )
