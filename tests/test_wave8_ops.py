"""Wave-8 ops: batched multi-query kNN, feature-hashing projection,
KWIC extraction, integer cume_dist — vs brute-force references."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _vec_ds(mat: np.ndarray):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(
                [row.tolist() for row in mat.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    return rd.from_arrow(t)


def test_multi_knn_matches_single_query_brute(ray_session):
    from ocr_service_ray.ops.similarity import multi_knn

    rng = np.random.RandomState(41)
    mat = rng.randn(120, 16)
    queries = mat[:4].copy()
    out = multi_knn(_vec_ds(mat), queries, k=5).to_pandas()
    assert len(out) == 20
    m64 = mat.astype(np.float32).astype(np.float64)
    for qi in range(4):
        q = queries[qi].astype(np.float32).astype(np.float64)
        sims = np.round(
            (m64 @ q) / (np.linalg.norm(m64, axis=1) * np.linalg.norm(q)), 6
        )
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = out[out["query_id"] == qi].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert got["vec_id"].tolist() == order.tolist()
        # self-match leads its own query
        assert got["vec_id"].iloc[0] == qi


def test_hash_project_quantized(ray_session):
    from ocr_service_ray.ops.vector import hash_project_quantized, quantize_embeddings

    rng = np.random.RandomState(43)
    mat = rng.randn(40, 8)
    out = (
        hash_project_quantized(_vec_ds(mat), n_out=4)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    q = (
        quantize_embeddings(_vec_ds(mat))
        .to_pandas()
        .pivot(index="vec_id", columns="dim", values="q")
        .sort_index()
    )
    dims = sorted(q.columns)
    w = {
        (d, j): (1 if int(hashlib.md5(f"{d}:{j}".encode()).hexdigest()[0], 16) < 8 else -1)
        for d in dims
        for j in range(4)
    }
    for j in range(4):
        expect = sum(q[d] * w[(d, j)] for d in dims)
        assert (out[f"p{j}"] == expect).all()


def test_keyword_contexts(ray_session):
    from ocr_service_ray.ops.chunking import keyword_contexts

    out = (
        keyword_contexts(
            _ds({"doc_id": [1, 2], "text": ["hit a b hit c", "no match here"]}),
            "hit",
            n_ctx=2,
        )
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.loc[0].tolist() == [1, 0, "", "a b"]
    assert out.loc[1].tolist() == [1, 3, "a b", "c"]


def test_cume_dist_micro(ray_session):
    from ocr_service_ray.ops.window import cume_dist_micro

    df = {
        "k": ["a"] * 4 + ["b"] * 2,
        "i": [1, 2, 3, 4, 5, 6],
        "v": [10, 20, 20, 30, 7, 7],
    }
    out = (
        cume_dist_micro(_ds(df), "k", "v", "i")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # a: 10 -> 1/4, 20 -> 3/4 (peers), 30 -> 4/4; b: ties -> 2/2
    assert out["cume_micro"].tolist() == [
        250000, 750000, 750000, 1000000, 1000000, 1000000
    ]


def test_multi_knn_lsh_restriction(ray_session):
    from ocr_service_ray.ops.similarity import multi_knn_lsh

    rng = np.random.RandomState(47)
    mat = rng.randn(150, 64)
    queries = mat[:3].copy()
    out = multi_knn_lsh(_vec_ds(mat), queries, k=5).to_pandas()
    # brute-force replica of the restricted search
    planes = np.random.RandomState(13).standard_normal((4, 64))

    def cells(m):
        bits = (m.astype(np.float64) @ planes.T) > 0.0
        return (bits.astype(np.int64) << np.arange(4)).sum(axis=1)

    m64 = mat.astype(np.float32).astype(np.float64)
    vcells = cells(m64)
    qcells = cells(queries.astype(np.float32).astype(np.float64))
    for qi in range(3):
        q = queries[qi].astype(np.float32).astype(np.float64)
        sims = np.round(
            (m64 @ q) / (np.linalg.norm(m64, axis=1) * np.linalg.norm(q)), 6
        )
        cand = np.where(
            np.array([bin(int(c) ^ int(qcells[qi])).count("1") for c in vcells]) <= 1
        )[0]
        order = cand[np.lexsort((cand, -sims[cand]))][:5]
        got = out[out["query_id"] == qi].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert got["vec_id"].tolist() == order.tolist()
