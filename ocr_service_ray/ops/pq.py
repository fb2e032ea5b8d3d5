"""Product quantization for ANN — codebook training, encoding and
asymmetric-distance (ADC) search evaluation (Jégou, Douze & Schmid,
"Product quantization for nearest neighbor search", TPAMI 2011).

PQ is the vector-compression tier of the similarity family: IVF/LSH
(ops/similarity.py) prune WHICH vectors are scored; PQ shrinks WHAT
is stored per vector (m uint8 codes instead of dim floats — 64-dim
float32 → 2 bytes at m=2, a 128× compression) and scores candidates
against a k×m lookup table instead of raw vectors.

Composition, not new machinery: each subspace codebook is the
existing deterministic integer-kmeans (ops/kmeans.py — min-id
seeding, micro-int fixpoint), run on the sliced sub-vectors; encoding
and reconstruction error are ONE map_batches pass (codebooks ride the
closure, a few KB); the exact-vs-ADC recall evaluation reuses the
combiner top-k discipline. All distances are exact integers over
micro-scaled coordinates, so every output is layout-invariant and
deterministic — rows-only at the driver gate only because kmeans
training is iterative (the documented kmeans_clusters precedent);
pytest pins an independent numpy recomputation of the error and the
recall bounds.
"""

from __future__ import annotations

from ocr_service_ray.ops.pool import bcast_stage

import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_service_ray.ops import similarity


def _micro(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1_000_000.0 + 0.5).astype(np.int64)


def pq_train(
    ds,
    m: int = 2,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iters: int = 8,
) -> list[np.ndarray]:
    """Train ``m`` subspace codebooks (each ``k`` × dim/m, micro-int)
    with the deterministic distributed kmeans per subspace. dim must
    divide evenly by ``m``."""
    from ocr_service_ray.ops.kmeans import kmeans

    probe = ds.limit(1).to_pandas()
    dim = len(probe[vec_col].iloc[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books: list[np.ndarray] = []
    for s in range(m):
        lo = s * sub

        def slice_vecs(b: pa.Table, lo=lo, hi=lo + sub) -> pa.Table:
            mat = similarity._as_matrix(b[vec_col])[:, lo:hi]
            return pa.table(
                {
                    id_col: b[id_col],
                    vec_col: pa.array(list(mat.astype(np.float64))),
                }
            )

        sub_ds = ds.select_columns([id_col, vec_col]).map_batches(
            slice_vecs, batch_format="pyarrow"
        )
        cents, _ = kmeans(
            sub_ds, k=k, vec_col=vec_col, id_col=id_col, max_iters=max_iters
        )
        books.append(_micro(np.asarray(cents, dtype=np.float64)))
    return books


def pq_encode_and_error(
    ds,
    books: list[np.ndarray],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """ONE pass: per vector the nearest centroid per subspace (exact
    int micro L2, tie → lowest code) and its squared reconstruction
    error. Returns a Dataset of (id, code_0..code_{m-1}, sqerr)."""
    m = len(books)
    sub = books[0].shape[1]

    def encode(b: pa.Table) -> pa.Table:
        mat = _micro(similarity._as_matrix(b[vec_col]).astype(np.float64))
        cols = {id_col: b[id_col]}
        err = np.zeros(len(mat), dtype=np.int64)
        for s, book in enumerate(books):
            x = mat[:, s * sub : (s + 1) * sub]
            # (n, k) int squared distances — exact
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2 * x @ book.T
                + (book * book).sum(axis=1)
            )
            code = np.argmin(d2, axis=1)  # argmin takes the FIRST min: lowest code
            cols[f"code_{s}"] = pa.array(code.astype(np.int64))
            err += d2[np.arange(len(mat)), code]
        cols["sqerr"] = pa.array(err)
        return pa.table(cols)

    return ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pyarrow"
    )


def pq_adc_topk(
    codes_df: pd.DataFrame,
    books: list[np.ndarray],
    query_vec: np.ndarray,
    topk: int,
    id_col: str = "vec_id",
) -> list[int]:
    """ADC: distance(q, x) ≈ Σ_s ||q_s − c_{s, code_s(x)}||² — one
    k×m integer lookup table, then a vectorized gather over the code
    table (codes are the compressed corpus; raw vectors never load).
    Tie → smallest id."""
    m = len(books)
    sub = books[0].shape[1]
    q = _micro(np.asarray(query_vec, dtype=np.float64))
    lut = np.stack(
        [
            ((q[s * sub : (s + 1) * sub] - books[s]) ** 2).sum(axis=1)
            for s in range(m)
        ]
    )  # (m, k) int
    dist = np.zeros(len(codes_df), dtype=np.int64)
    for s in range(m):
        dist += lut[s][codes_df[f"code_{s}"].to_numpy()]
    order = np.lexsort((codes_df[id_col].to_numpy(), dist))
    return [int(i) for i in codes_df[id_col].to_numpy()[order[:topk]]]


def pq_eval(
    ds,
    m: int = 2,
    k: int = 16,
    query_id: int = 0,
    topk: int = 10,
    rerank: int = 50,
    max_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Train → encode → the full PQ search pipeline (ADC shortlist of
    ``rerank`` candidates from codes alone, then exact rerank of just
    those ``rerank`` raw vectors) vs exact brute top-k for one query.
    One summary row: (m, k, n_vectors, total_sqerr, adc_recall,
    recall_at_k) — adc_recall is the code-only shortlist hit count,
    recall_at_k the after-rerank count (the production metric). The
    codes table NEVER visits the driver: the ADC gather runs inside
    map_batches against a ``ray.put`` k×m LUT and folds through the
    combiner top-k, and total_sqerr/n come from per-block partial
    sums (the driver merges |blocks| two-int rows). The materialized
    codes Dataset is the compressed index itself — bytes per row; at
    10^12 vectors persist it once with write_parquet and re-read, the
    scan below is unchanged."""
    import ray
    import pyarrow.compute as pc

    from ocr_service_ray.ops.relational import topk as topk_op

    books = pq_train(
        ds, m=m, k=k, vec_col=vec_col, id_col=id_col, max_iters=max_iters
    )
    # materialized: consumed twice (sqerr partials + ADC scan) — lazy
    # lineage would re-run the encode pass per consumer
    codes = pq_encode_and_error(
        ds, books, vec_col=vec_col, id_col=id_col
    ).materialize()

    def sqerr_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": pa.array([pc.sum(b["sqerr"]).as_py() or 0], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    parts = codes.map_batches(sqerr_partial, batch_format="pyarrow").to_pandas()
    total_sqerr = int(parts["s"].sum())
    n = int(parts["n"].sum())

    def pick_query(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b[id_col], query_id))

    qv = np.asarray(
        ds.select_columns([id_col, vec_col])
        .map_batches(pick_query, batch_format="pyarrow")
        .limit(1)
        .to_pandas()[vec_col]
        .iloc[0],
        dtype=np.float64,
    )
    qm = _micro(qv)

    def l2_score(b: pa.Table) -> pa.Table:
        mat = _micro(similarity._as_matrix(b[vec_col]).astype(np.float64))
        d2 = ((mat - qm) ** 2).sum(axis=1)
        return pa.table({id_col: b[id_col], "d2": pa.array(d2)})

    # exact ground truth via the combiner top-k (ascending distance,
    # tie -> id asc) — raw vectors never leave their blocks
    exact_df = topk_op(
        ds.select_columns([id_col, vec_col]).map_batches(
            l2_score, batch_format="pyarrow"
        ),
        ["d2", id_col],
        topk,
        descending=[False, False],
    ).to_pandas()
    exact = set(int(i) for i in exact_df[id_col])

    # distributed ADC: the k×m LUT is broadcast once; every block
    # gathers its own code rows against it and only per-block top-R
    # candidate rows leave the block (combiner top-k) — identical to
    # pq_adc_topk on the pulled table (pytest-pinned)
    R = max(rerank, topk)
    sub = books[0].shape[1]
    lut = np.stack(
        [
            ((qm[s * sub : (s + 1) * sub] - books[s]) ** 2).sum(axis=1)
            for s in range(m)
        ]
    )  # (m, k) int64
    lut_nbytes = lut.nbytes
    lut_ref = ray.put(lut)

    class AdcScore:
        def __init__(self):
            self.lut = ray.get(lut_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            dist = np.zeros(b.num_rows, dtype=np.int64)
            for s in range(len(self.lut)):
                dist += self.lut[s][b[f"code_{s}"].to_numpy()]
            return pa.table({id_col: b[id_col], "d2": pa.array(dist)})

    sl_df = topk_op(
        bcast_stage(codes, AdcScore, lut_nbytes),
        ["d2", id_col],
        R,
        descending=[False, False],
    ).to_pandas()
    sl_order = np.lexsort((sl_df[id_col].to_numpy(), sl_df["d2"].to_numpy()))
    shortlist = [int(i) for i in sl_df[id_col].to_numpy()[sl_order[:R]]]
    adc_hits = len(exact & set(shortlist[:topk]))

    # exact rerank of ONLY the shortlist rows (a pruned id-membership
    # read — ``rerank`` raw vectors, never the corpus)
    sl = pa.array(np.asarray(shortlist, dtype=np.int64))

    def pick_shortlist(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b[id_col], value_set=sl))
        mat = _micro(similarity._as_matrix(t[vec_col]).astype(np.float64))
        d2 = (
            ((mat - qm) ** 2).sum(axis=1)
            if len(mat)
            else np.array([], dtype=np.int64)
        )
        return pa.table({id_col: t[id_col], "d2": pa.array(d2)})

    rr = (
        ds.select_columns([id_col, vec_col])
        .map_batches(pick_shortlist, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.lexsort((rr[id_col].to_numpy(), rr["d2"].to_numpy()))
    reranked = set(int(i) for i in rr[id_col].to_numpy()[order[:topk]])
    return pd.DataFrame(
        {
            "m": [m],
            "k": [k],
            "n_vectors": [n],
            "total_sqerr": [total_sqerr],
            "adc_recall": [adc_hits],
            "recall_at_k": [len(exact & reranked)],
        }
    ).astype("int64")
