"""Product quantization (ops/pq.py): independent error recomputation,
perfect recall on separated clusters, ADC LUT correctness, layout
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_ds(mat, ids=None, parts=4):
    import ray.data as rd

    n = len(mat)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64) if ids is None else ids,
            "embedding": [row.astype(np.float64) for row in mat],
        }
    )
    return rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(parts)


def _clustered(seed=3, n_per=40, n_clusters=4, dim=8):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1, 1, (n_clusters, dim)) * 10.0
    rows = []
    for c in centers:
        rows.append(c + rng.uniform(-0.01, 0.01, (n_per, dim)))
    return np.vstack(rows)


def test_pq_error_matches_numpy_recomputation(ray_session):
    from ocr_service_ray.ops.pq import pq_encode_and_error, pq_train

    mat = _clustered()
    ds = _emb_ds(mat)
    books = pq_train(ds, m=2, k=4, max_iters=6)
    codes = pq_encode_and_error(ds, books).to_pandas().sort_values("vec_id")
    # independent recomputation from raw vectors + returned codebooks
    micro = np.floor(mat * 1_000_000.0 + 0.5).astype(np.int64)
    sub = micro.shape[1] // 2
    err = np.zeros(len(mat), dtype=np.int64)
    for s, book in enumerate(books):
        x = micro[:, s * sub : (s + 1) * sub]
        d2 = ((x[:, None, :] - book[None, :, :]) ** 2).sum(axis=2)
        code = d2.argmin(axis=1)
        assert (codes[f"code_{s}"].to_numpy() == code).all()
        err += d2[np.arange(len(mat)), code]
    assert (codes["sqerr"].to_numpy() == err).all()


def test_pq_perfect_recall_on_separated_clusters(ray_session):
    from ocr_service_ray.ops.pq import pq_eval

    mat = _clustered()
    # rerank >= cluster size: even if a subspace codebook merges two
    # clusters (ADC ties, id-asc shortlist), the query's whole cluster
    # (ids 0..39) reaches the exact rerank
    out = pq_eval(
        _emb_ds(mat), m=2, k=4, query_id=0, topk=10, rerank=40, max_iters=8
    ).iloc[0]
    # 4 tight well-separated clusters, 4 codes per subspace: the
    # query's own cluster is exactly recoverable
    assert out["recall_at_k"] == 10
    assert out["n_vectors"] == len(mat)
    # quantization beats the k=1 baseline (one centroid = the mean):
    # Lloyd's may land in a local optimum (merged clusters), but it
    # must never be worse than no clustering at all
    micro = np.floor(mat * 1_000_000.0 + 0.5).astype(np.int64)
    baseline = int(((micro - micro.mean(axis=0).astype(np.int64)) ** 2).sum())
    assert 0 < out["total_sqerr"] < baseline


def test_pq_adc_lut_equals_reconstruction_distance():
    from ocr_service_ray.ops.pq import pq_adc_topk

    rng = np.random.RandomState(5)
    books = [
        np.floor(rng.uniform(-1, 1, (4, 3)) * 1_000_000).astype(np.int64)
        for _ in range(2)
    ]
    codes_df = pd.DataFrame(
        {
            "vec_id": np.arange(20, dtype=np.int64),
            "code_0": rng.randint(0, 4, 20),
            "code_1": rng.randint(0, 4, 20),
        }
    )
    q = rng.uniform(-1, 1, 6)
    got = pq_adc_topk(codes_df, books, q, topk=20)
    # reference: reconstruct each vector from its codes, exact int L2
    qm = np.floor(q * 1_000_000.0 + 0.5).astype(np.int64)
    recon = np.hstack(
        [books[s][codes_df[f"code_{s}"].to_numpy()] for s in range(2)]
    )
    d2 = ((recon - qm) ** 2).sum(axis=1)
    ref = [
        int(i)
        for i in codes_df["vec_id"].to_numpy()[np.lexsort((codes_df["vec_id"], d2))]
    ]
    assert got == ref


def test_pq_layout_invariance(ray_session):
    from ocr_service_ray.ops.pq import pq_eval

    mat = _clustered(seed=11)
    a = pq_eval(_emb_ds(mat, parts=1), m=2, k=4, max_iters=6)
    b = pq_eval(_emb_ds(mat, parts=7), m=2, k=4, max_iters=6)
    pd.testing.assert_frame_equal(a, b)
