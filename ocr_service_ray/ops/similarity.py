"""Similarity search over an embedding column (list<float>).

- :func:`knn_brute` — the exact baseline: per-batch numpy matmul of
  the block against a broadcast query matrix (the query is shipped
  once via closure capture of a small ndarray — ray.put semantics for
  a value this small), then a distributed sort + limit. Scales as one
  full scan; this is the correctness reference.
- :func:`IvfIndex` — the scale path: coarse k-means centroids trained
  once on a driver-side sample, assignments added as a column in one
  map_batches pass; a query probes only the ``nprobe`` nearest
  centroid partitions (pushed-down filter on the assignment column),
  turning a full scan into a ~nprobe/nlist fraction scan. Recall is
  measured against :func:`knn_brute` in the tests.

All cosine math is float64 regardless of storage dtype, rounded to
6dp at the edge so results hash identically to the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix without per-row Python.

    Uses the flattened Arrow buffer — zero-copy when the layout is
    contiguous and fixed-width per row.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def cosine_to_query(batch: pa.Table, query: np.ndarray, vec_col: str = "embedding") -> pa.Table:
    mat = _as_matrix(batch[vec_col])
    q = query.astype(np.float64)
    qn = np.linalg.norm(q) or 1.0
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round((mat @ q) / (norms * qn), 6)
    return batch.append_column("cos_sim", pa.array(sims, pa.float64()))


def knn_brute(ds, query: np.ndarray, k: int = 5, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact top-k by cosine: scan → scalar column → combiner-style
    top-k (per-block local top-k, then one pass over the candidates —
    ops/relational.topk; tiebreak id asc). Returns {id_col, cos_sim}."""
    from ocr_service_ray.ops.relational import topk

    scored = ds.map_batches(
        lambda b: cosine_to_query(b, query, vec_col).select([id_col, "cos_sim"]),
        batch_format="pyarrow",
    )
    return topk(scored, ["cos_sim", id_col], k, descending=[True, False])


def _kmeans(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Small deterministic k-means (numpy only) for IVF coarse quantizer."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)
    centroids = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            pts = sample[assign == c]
            if len(pts):
                centroids[c] = pts.mean(axis=0)
    return centroids


def _empty_knn_result(index_path: str | None, id_col: str):
    """Typed empty ``(id_col, cos_sim)`` Dataset for a probe whose
    cells are all absent — same pattern as ``InvertedIndex.postings``.
    The id type comes from any written index file (int64 fallback when
    the index is entirely empty)."""
    import glob

    import ray.data as rd

    id_type = pa.int64()
    if index_path is not None:
        files = glob.glob(f"{index_path}/*/*.parquet")
        if files:
            import pyarrow.parquet as pq

            id_type = pq.read_schema(sorted(files)[0]).field(id_col).type
    return rd.from_arrow(
        pa.table(
            {
                id_col: pa.array([], id_type),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
    )


class IvfIndex:
    """IVF-flat index over a Dataset: train coarse centroids on a
    sample, then PERSIST the corpus as cell-partitioned parquet
    (``partition_cols=["ivf_cell"]``) — the assignment column IS the
    physical partitioning key, so a probe reads ONLY the ``nprobe``
    probed cell directories. A 100 TB index scans ~nprobe/nlist of its
    bytes per query instead of filtering a full scan."""

    def __init__(self, nlist: int = 16, nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id"):
        self.nlist = nlist
        self.nprobe = nprobe
        self.vec_col = vec_col
        self.id_col = id_col
        self.centroids: np.ndarray | None = None
        self.index_path: str | None = None

    def build(self, ds, sample_size: int = 2048, seed: int = 13, index_path: str | None = None):
        """Assign cells in one map_batches pass and write the
        cell-partitioned layout. ``index_path`` defaults to a fresh
        temp dir (production: a persistent parquet/Lance location)."""
        import tempfile

        sample_rows = ds.limit(sample_size).take_all()  # small, driver-side by design
        sample = np.stack([np.asarray(r[self.vec_col], dtype=np.float64) for r in sample_rows])
        self.centroids = _kmeans(sample, self.nlist, seed=seed)
        cents = self.centroids

        def assign(batch: pa.Table) -> pa.Table:
            mat = _as_matrix(batch[self.vec_col])
            d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return batch.append_column("ivf_cell", pa.array(d.argmin(axis=1), pa.int32()))

        self.index_path = index_path or tempfile.mkdtemp(prefix="ivf_index_")
        # ONE streaming pass: read → assign → partitioned write. No
        # materialize — the index lives in storage, not the object store.
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            self.index_path, partition_cols=["ivf_cell"]
        )
        return self

    def probe_paths(self, query: np.ndarray) -> list[str]:
        """The ``nprobe`` nearest cells' partition directories — what a
        search actually reads (tests assert < 100% of partitions)."""
        assert self.centroids is not None, "call build() first"
        d = ((self.centroids - query.astype(np.float64)[None, :]) ** 2).sum(axis=1)
        cells = sorted(int(c) for c in d.argsort()[: self.nprobe])
        return [f"{self.index_path}/ivf_cell={c}" for c in cells]

    def search(self, query: np.ndarray, k: int = 5):
        import glob
        import os

        # Read ONLY the probed cell partitions (hive layout written by
        # build); a cell directory may be absent if no vector landed in
        # that cell (filtered like LshIndex.search). File list passed
        # explicitly — a mixed dir list trips read_parquet's
        # file-vs-dir resolution.
        files = [
            f
            for p in self.probe_paths(query)
            if os.path.isdir(p)
            for f in sorted(glob.glob(f"{p}/*.parquet"))
        ]
        if not files:
            return _empty_knn_result(self.index_path, self.id_col)
        from ocr_service_ray.sources.readers import read_parquet_clean

        probed = read_parquet_clean(files, columns=[self.id_col, self.vec_col])
        return knn_brute(probed, query, k, self.vec_col, self.id_col)


class LshIndex:
    """Hyperplane-LSH partitioned ANN — the LSH-bucketed scale path.

    ``nbits`` fixed random hyperplanes (seeded, inlined as plain
    constants) give each vector a sign-bit cell id; vectors are
    persisted as cell-partitioned parquet exactly like :class:`IvfIndex`
    and a query reads only the cells within Hamming distance
    ``radius`` of its own cell (multi-probe LSH: 1 + nbits cells of
    2^nbits at radius 1 — a ~(1+nbits)/2^nbits fraction scan).

    Unlike k-means centroids, the quantizer here is pure arithmetic of
    the vector — the WHOLE search (assignment, probe set, rerank) is
    reproducible in SQL, so the driver's DuckDB oracle can check the
    ANN result exactly without requiring recall-1 against brute force.
    """

    def __init__(
        self,
        nbits: int = 4,
        radius: int = 1,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 13,
    ):
        self.nbits = nbits
        self.radius = radius
        self.vec_col = vec_col
        self.id_col = id_col
        self.seed = seed
        self.planes: np.ndarray | None = None
        self.index_path: str | None = None

    def _cells(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0.0
        return (bits.astype(np.int64) << np.arange(self.nbits, dtype=np.int64)).sum(axis=1)

    def build(self, ds, dim: int, index_path: str | None = None):
        import tempfile

        rng = np.random.RandomState(self.seed)
        self.planes = rng.standard_normal((self.nbits, dim))

        def assign(batch: pa.Table) -> pa.Table:
            mat = _as_matrix(batch[self.vec_col])
            return batch.append_column(
                "lsh_cell", pa.array(self._cells(mat), pa.int32())
            )

        self.index_path = index_path or tempfile.mkdtemp(prefix="lsh_index_")
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            self.index_path, partition_cols=["lsh_cell"]
        )
        return self

    def probe_cells(self, query: np.ndarray) -> list[int]:
        assert self.planes is not None, "call build() first"
        qcell = int(self._cells(query.astype(np.float64)[None, :])[0])
        return sorted(
            c
            for c in range(1 << self.nbits)
            if bin(c ^ qcell).count("1") <= self.radius
        )

    def search(self, query: np.ndarray, k: int = 5):
        import glob
        import os

        paths = [f"{self.index_path}/lsh_cell={c}" for c in self.probe_cells(query)]
        files = [
            f
            for p in paths
            if os.path.isdir(p)
            for f in sorted(glob.glob(f"{p}/*.parquet"))
        ]
        if not files:
            return _empty_knn_result(self.index_path, self.id_col)
        from ocr_service_ray.sources.readers import read_parquet_clean

        probed = read_parquet_clean(files, columns=[self.id_col, self.vec_col])
        return knn_brute(probed, query, k, self.vec_col, self.id_col)


def multi_knn(
    ds,
    queries: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Batched exact top-k by cosine for MANY queries in one corpus
    scan — the production ANN-serving shape (one matmul per batch
    against the broadcast (q, d) query matrix, never one scan per
    query). Per block: local top-k rows per query; then one combiner
    ``grouped_topk`` keyed by query id. Returns (query_id, id_col,
    cos_sim); tie-break id ascending, same float discipline as
    ``cosine_to_query`` (round 6) so the DuckDB oracle reproduces it.
    """
    from ocr_service_ray.ops.relational import grouped_topk

    q = queries.astype(np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    nq = q.shape[0]

    def score(b: pa.Table) -> pa.Table:
        mat = _as_matrix(b[vec_col])
        if mat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], b[id_col].type),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat @ q.T) / norms[:, None] / qn[None, :], 6)  # (n, nq)
        n = mat.shape[0]
        kk = min(k, n)
        # local top-k rows per query column
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        rows = part.T.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qid),
                id_col: pa.array(ids[rows]),
                "cos_sim": pa.array(sims[rows, qid], pa.float64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored, ["query_id"], ["cos_sim", id_col], k, [True, False]
    )


def multi_knn_lsh(
    ds,
    queries: np.ndarray,
    k: int = 5,
    nbits: int = 4,
    radius: int = 1,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Batched multi-query LSH-restricted kNN: the multi-probe search
    of :class:`LshIndex` for MANY queries in one scan — per batch,
    sign-bit cells are assigned vectorized, each query considers only
    vectors within Hamming ``radius`` of its own cell, and the rerank
    is the same rounded-cosine discipline as ``multi_knn``. The
    restriction is pure arithmetic, so the whole search is
    SQL-reproducible (bit_count(xor(cell, qcell)) <= radius)."""
    from ocr_service_ray.ops.relational import grouped_topk

    dim = queries.shape[1]
    planes = np.random.RandomState(seed).standard_normal((nbits, dim))
    q = queries.astype(np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    nq = q.shape[0]

    def cells_of(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes.T) > 0.0
        return (bits.astype(np.int64) << np.arange(nbits, dtype=np.int64)).sum(axis=1)

    qcells = cells_of(q)
    # 2^nbits x 2^nbits Hamming table — tiny, rides the closure
    n_cells = 1 << nbits
    ham = np.zeros((n_cells, n_cells), dtype=np.int64)
    for a in range(n_cells):
        for b_ in range(n_cells):
            ham[a, b_] = bin(a ^ b_).count("1")

    def score(b: pa.Table) -> pa.Table:
        mat = _as_matrix(b[vec_col])
        if mat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], b[id_col].type),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        vcells = cells_of(mat)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat @ q.T) / norms[:, None] / qn[None, :], 6)
        cand = ham[vcells[:, None], qcells[None, :]] <= radius  # (n, nq)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        rows, qids = np.nonzero(cand)
        return pa.table(
            {
                "query_id": pa.array(qids.astype(np.int64)),
                id_col: pa.array(ids[rows]),
                "cos_sim": pa.array(sims[rows, qids], pa.float64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(scored, ["query_id"], ["cos_sim", id_col], k, [True, False])


def group_set_jaccard(ds, group_col: str, value_col: str, scale: int = 1_000_000):
    """Pairwise Jaccard similarity between groups' DISTINCT value sets
    — the inter-slice duplication map (how much of source A's shingle
    vocabulary source B shares). Exact ppm:

        jac_ppm(a, b) = floor( scale * |S_a ∩ S_b|
                               / (|S_a| + |S_b| - |S_a ∩ S_b|) )

    Distribution (no pairwise set materialization anywhere):
    1. one combiner collapses rows to DISTINCT (group, value) pairs;
    2. per-group set sizes fall out of the same table (combiner);
    3. ONE bucketed shuffle on the VALUE emits, per value, every
       group pair sharing it (|groups per value| is group-cardinality
       bounded); a final combiner counts pairs = intersections.

    Returns a driver DataFrame (group_a, group_b, n_inter, jac_ppm),
    one row per UNORDERED pair with non-empty intersection (disjoint
    pairs are omitted — document at the call site).
    """
    from itertools import combinations

    import pandas as pd

    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    distinct = grouped_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        {"_c": (None, "count")},
    )
    sizes = (
        grouped_agg(
            distinct.select_columns([group_col]),
            [group_col],
            {"n": (None, "count")},
        )
        .to_pandas()
        .set_index(group_col)["n"]
        .to_dict()
    )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        groups = sorted(g[group_col].tolist())
        if len(groups) < 2:
            return None
        a_col, b_col = [], []
        for x, y in combinations(groups, 2):
            a_col.append(x)
            b_col.append(y)
        return pd.DataFrame({"group_a": a_col, "group_b": b_col})

    inter = grouped_agg(
        bucketed_map_groups(
            distinct.select_columns([value_col, group_col]), [value_col], emit
        ),
        ["group_a", "group_b"],
        {"n_inter": (None, "count")},
    ).to_pandas()
    if inter.empty:
        return pd.DataFrame(
            {"group_a": [], "group_b": [], "n_inter": [], "jac_ppm": []}
        )
    jac = [
        (scale * int(ni)) // (int(sizes[a]) + int(sizes[b]) - int(ni))
        for a, b, ni in zip(inter["group_a"], inter["group_b"], inter["n_inter"])
    ]
    inter["n_inter"] = inter["n_inter"].astype("int64")
    inter["jac_ppm"] = pd.array(jac, dtype="int64")
    return inter.sort_values(["group_a", "group_b"]).reset_index(drop=True)
