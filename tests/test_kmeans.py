"""Distributed k-means (ops/kmeans.py): byte-identical to a
single-process numpy reference implementing the same micro-int
arithmetic, layout invariance, blob recovery, empty-cluster safety."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from ocr_service_ray.ops.kmeans import assign_clusters, kmeans


def _blobs(n=240, k=3, dim=6, seed=8, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 5.0
    labels = rng.integers(0, k, n)
    vecs = centers[labels] + rng.normal(size=(n, dim)) * spread
    return vecs.astype(np.float64), labels


def _tbl(vecs):
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float64())
            ),
        }
    )


def _ref_kmeans(vecs, k, max_iters=20):
    # identical arithmetic: md5-uniform seeding, argmin c·c - 2 v·c,
    # micro-int sums, empty clusters keep their centroid
    hs = np.array(
        [
            int(hashlib.md5(f"kmeans:{i}".encode()).hexdigest()[:15], 16)
            for i in range(len(vecs))
        ]
    )
    cents = vecs[np.argsort(hs, kind="stable")[:k]].copy()
    for it in range(1, max_iters + 1):
        d = (cents * cents).sum(axis=1)[None, :] - 2.0 * (vecs @ cents.T)
        a = np.argmin(d, axis=1)
        micro = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
        new = cents.copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = micro[m].sum(axis=0) / 1e6 / m.sum()
        if np.array_equal(new, cents):
            return cents, it, a
        cents = new
    return cents, max_iters, a


@pytest.mark.parametrize("nblocks", [1, 9])
def test_matches_reference_bytewise(ray_session, nblocks):
    import ray.data as rd

    vecs, _ = _blobs()
    ref_c, ref_it, _ = _ref_kmeans(vecs, 3)
    got_c, got_it = kmeans(
        rd.from_arrow(_tbl(vecs)).repartition(nblocks), k=3
    )
    assert got_it == ref_it
    assert np.array_equal(got_c, ref_c)  # exact — layout-invariant


def test_recovers_blobs(ray_session):
    import ray.data as rd

    # seed chosen so hash-seeding lands one seed per blob (Lloyd's is
    # a local optimizer; some seeds legitimately split a blob)
    vecs, labels = _blobs(seed=11)
    cents, _ = kmeans(rd.from_arrow(_tbl(vecs)), k=3)
    out = assign_clusters(rd.from_arrow(_tbl(vecs)), cents).to_pandas()
    # every true blob maps to exactly one k-means cluster
    mapping = {}
    for true in range(3):
        assigned = set(out.loc[labels == true, "cluster"])
        assert len(assigned) == 1
        mapping[true] = assigned.pop()
    assert len(set(mapping.values())) == 3


def test_k_exceeds_points(ray_session):
    import ray.data as rd

    vecs = np.array([[0.0, 0.0], [10.0, 10.0]])
    cents, _ = kmeans(rd.from_arrow(_tbl(vecs)), k=2, max_iters=5)
    assert cents.shape == (2, 2)


def test_driver_merge_identical(ray_session):
    import ray.data as rd

    vecs, _ = _blobs(seed=17)
    a, it_a = kmeans(rd.from_arrow(_tbl(vecs)).repartition(6), k=3)
    b, it_b = kmeans(
        rd.from_arrow(_tbl(vecs)).repartition(6), k=3, merge="driver"
    )
    assert it_a == it_b and np.array_equal(a, b)
