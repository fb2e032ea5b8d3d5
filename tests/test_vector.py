"""Grouped vector aggregation (ops/vector.py): sums vs numpy
reference across block layouts, micro-int exactness, centroids."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_service_ray.ops.vector import centroids, grouped_vector_sum


def _data(n=200, dim=8, k=4, seed=2):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, k, n).astype(np.int64)
    t = pa.table(
        {
            "label": pa.array(labels),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    return t, vecs.astype(np.float64), labels


@pytest.mark.parametrize("nblocks", [1, 7])
def test_micro_sums_match_reference(ray_session, nblocks):
    import ray.data as rd

    t, vecs, labels = _data()
    micro = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
    got = (
        grouped_vector_sum(rd.from_arrow(t).repartition(nblocks), "label")
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    for lbl in np.unique(labels):
        sub = got[got["label"] == lbl]
        ref = micro[labels == lbl].sum(axis=0)
        assert sub["vsum"].to_numpy().tolist() == ref.tolist()
        assert (sub["n"] == (labels == lbl).sum()).all()


def test_centroids_match_numpy(ray_session):
    import ray.data as rd

    t, vecs, labels = _data(seed=5)
    c = centroids(rd.from_arrow(t).repartition(5), "label")
    for _, row in c.iterrows():
        ref = vecs[labels == row["label"]].mean(axis=0)
        assert np.allclose(row["centroid"], ref, atol=1e-12)
