"""Session-7 waves: hard-negative mining vs a labeled brute-force
reference; majority-supplier fold edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _labeled_vec_ds(mat: np.ndarray, labels):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(
                [row.tolist() for row in mat.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(list(labels), pa.string()),
        }
    )
    return rd.from_arrow(t)


def test_hard_negatives_excludes_same_label(ray_session):
    from ocr_service_ray.ops.similarity import hard_negatives

    rng = np.random.RandomState(47)
    mat = rng.randn(90, 12)
    labels = [f"c{i % 3}" for i in range(90)]
    queries = mat[:4].copy()
    qlab = labels[:4]
    out = hard_negatives(
        _labeled_vec_ds(mat, labels), queries, qlab, k=3
    ).to_pandas()
    assert len(out) == 12
    m64 = mat.astype(np.float32).astype(np.float64)
    labs = np.array(labels)
    for qi in range(4):
        q = queries[qi].astype(np.float32).astype(np.float64)
        sims = np.round(
            (m64 @ q) / (np.linalg.norm(m64, axis=1) * np.linalg.norm(q)), 6
        )
        sims = np.where(labs == qlab[qi], -np.inf, sims)
        order = np.lexsort((np.arange(len(sims)), -sims))[:3]
        got = out[out["query_id"] == qi].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert got["vec_id"].tolist() == order.tolist()
        # every returned negative has a different label than the query
        assert all(labs[v] != qlab[qi] for v in got["vec_id"])


def test_hard_negatives_all_same_label_empty(ray_session):
    from ocr_service_ray.ops.similarity import hard_negatives

    rng = np.random.RandomState(48)
    mat = rng.randn(20, 8)
    labels = ["only"] * 20
    out = hard_negatives(
        _labeled_vec_ds(mat, labels), mat[:2].copy(), ["only", "only"], k=3
    ).to_pandas()
    assert len(out) == 0
