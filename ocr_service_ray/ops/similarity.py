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


def group_set_jaccard(
    ds,
    group_col: str,
    value_col: str,
    scale: int = 1_000_000,
    as_dataset: bool = False,
):
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
    pairs are omitted — document at the call site). With
    ``as_dataset=True`` the same columns/values come back as a pair
    **Dataset** (unsorted) and the |groups|² matrix never visits the
    driver — only the |groups|-bounded size table does (broadcast
    once). Use that form when groups number ~10⁴+; both forms are
    pytest-asserted equal."""
    import pandas as pd

    from ocr_service_ray.ops.agg import grouped_agg

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

    # per-value group pairs via the whole-bucket vectorized emitter —
    # distinct-value count is corpus-bounded (shingles), the regime
    # where a per-group callable pays ~50µs/value in dispatch alone
    from ocr_service_ray.ops.agg import emit_group_pairs

    inter_ds = grouped_agg(
        emit_group_pairs(
            distinct.select_columns([value_col, group_col]),
            [value_col],
            group_col,
        ),
        ["group_a", "group_b"],
        {"n_inter": (None, "count")},
    )
    if as_dataset:
        import numpy as np
        import pyarrow as pa
        import ray

        from ocr_service_ray.ops.pool import bcast_stage, measured_nbytes

        sz_ref = ray.put(sizes)

        class Finish:
            def __init__(self):
                self.sizes = ray.get(sz_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                na = (
                    pd.Series(b["group_a"].to_pylist())
                    .map(self.sizes)
                    .to_numpy(dtype=np.int64)
                )
                nb = (
                    pd.Series(b["group_b"].to_pylist())
                    .map(self.sizes)
                    .to_numpy(dtype=np.int64)
                )
                ni = b["n_inter"].to_numpy(zero_copy_only=False).astype(np.int64)
                jac = scale * ni // (na + nb - ni)
                return pa.table(
                    {
                        "group_a": b["group_a"],
                        "group_b": b["group_b"],
                        "n_inter": pa.array(ni),
                        "jac_ppm": pa.array(jac),
                    }
                )

        return bcast_stage(inter_ds, Finish, measured_nbytes(sizes))
    inter = inter_ds.to_pandas()
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


def jaccard_pair_join(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold_ppm: int = 500_000,
):
    """EXACT set-similarity self-join — every unordered document pair
    whose ``ngram``-shingle Jaccard meets the threshold, found with
    PPJoin-style PREFIX FILTERING (Xiao et al., WWW'08) instead of an
    all-pairs product: under a common global token order, two sets
    with J >= t MUST share a token among their first
    ``|S| - ceil(t*|S|) + 1`` tokens, so only prefix-token postings
    generate candidates; every candidate is then verified exactly.
    This is the exact complement to MinHash-LSH dedup (ops/dedup.py):
    no false negatives, no probabilistic tuning.

    Distributed shape (nothing corpus-sized on the driver):
    1. distinct (id, shingle) pairs (combiner);
    2. shingle document-frequency (combiner) hash-joined back — the
       canonical order is (df, shingle), rarest first, so prefixes hit
       the emptiest postings;
    3. a bucketed per-ID fold sorts the doc's tokens and emits only
       its PREFIX rows; set size + the full sorted set (one
       US-separated string column — list columns don't survive the
       acero join) materialize per doc once;
    4. a bucketed per-SHINGLE fold emits candidate pairs from each
       prefix posting (posting lengths are prefix-pruned); a combiner
       dedups pairs;
    5. two hash joins attach both docs' set strings; a vectorized
       verify computes exact intersection and filters on

           jac_ppm = floor(1e6 * |A∩B| / (|A|+|B|-|A∩B|)) >= threshold

    Returns a Dataset (id_a, id_b, n_inter, jac_ppm). Documents with
    fewer than ``ngram`` tokens have empty sets and never pair.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg
    from ocr_service_ray.ops.relational import hash_join

    SEP = "\x1f"

    def explode(batch: pa.Table) -> pa.Table:
        seen = set()
        for key, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            ws = (t or "").split()
            for i in range(len(ws) - ngram + 1):
                seen.add((key, " ".join(ws[i : i + ngram])))
        ids = [k for k, _ in seen]
        sh = [w for _, w in seen]
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "shingle": pa.array(sh, pa.string()),
            }
        )

    pairs = grouped_agg(
        ds.select_columns([id_col, text_col]).map_batches(
            explode, batch_format="pyarrow"
        ),
        [id_col, "shingle"],
        {"_c": (None, "count")},
    )
    df = grouped_agg(
        pairs.select_columns(["shingle"]), ["shingle"], {"df": (None, "count")}
    )
    with_df = hash_join(
        pairs.select_columns([id_col, "shingle"]), df, on="shingle"
    )

    def prefix_and_set(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["df", "shingle"], kind="mergesort")
        toks = g["shingle"].tolist()
        s = len(toks)
        L = s - (threshold_ppm * s + 999_999) // 1_000_000 + 1
        key = g[id_col].iloc[0]
        return pd.DataFrame(
            {
                "shingle": toks[:L],
                id_col: [key] * L,
                "set_str": [SEP.join(toks)] * L,
                "set_size": pd.array([s] * L, dtype="int64"),
                "is_head": [1] + [0] * (L - 1),
            }
        )

    # materialize the two fan-out points: `prefixed` feeds both the
    # candidate branch and the doc-set branch, and `doc_sets` feeds
    # BOTH verification sides — left lazy, Ray 2.49's planner re-executes
    # the shared chain per consumer and the combined DAG stalls (repo
    # landmine: shared lazy subplans). Blocks live in the object store
    # (spillable), nothing lands on the driver.
    prefixed = bucketed_map_groups(with_df, [id_col], prefix_and_set).materialize()
    doc_sets = prefixed.map_batches(
        lambda b: b.filter(pc.equal(b["is_head"], 1)).select(
            [id_col, "set_str"]
        ),
        batch_format="pyarrow",
    ).materialize()

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].tolist())
        if len(ids) < 2:
            return None
        a_col, b_col = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_col.append(ids[i])
                b_col.append(ids[j])
        return pd.DataFrame({"id_a": a_col, "id_b": b_col})

    # materialize: candidate pairs are prefix-pruned small; the count
    # below must not re-execute the plan, and a FULLY-empty dataset
    # loses its schema through acero joins even after repartition
    # (repo landmine) — short-circuit instead
    cand = (
        grouped_agg(
            bucketed_map_groups(
                prefixed.select_columns(["shingle", id_col]),
                ["shingle"],
                emit_pairs,
            ),
            ["id_a", "id_b"],
            {"_n": (None, "count")},
        )
        .drop_columns(["_n"])
        .materialize()
    )
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "n_inter": pa.array([], pa.int64()),
                    "jac_ppm": pa.array([], pa.int64()),
                }
            )
        )

    def rn(frm: str, to: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [to if c == frm else c for c in b.column_names]
            )

        return f

    side_a = doc_sets.map_batches(rn(id_col, "id_a"), batch_format="pyarrow")
    side_a = side_a.map_batches(rn("set_str", "set_a"), batch_format="pyarrow")
    side_b = doc_sets.map_batches(rn(id_col, "id_b"), batch_format="pyarrow")
    side_b = side_b.map_batches(rn("set_str", "set_b"), batch_format="pyarrow")
    # repartition: bucketed folds emit schema-less empty blocks that
    # the acero join rejects (repo landmine)
    joined = hash_join(
        hash_join(cand.repartition(4), side_a.repartition(4), on="id_a")
        .repartition(4),  # chained joins need a real exchange between
        side_b.repartition(4),
        on="id_b",
    )

    def verify(b: pd.DataFrame) -> pa.Table:
        out_a, out_b, inter, jac = [], [], [], []
        for a, bb, sa, sb in zip(
            b["id_a"], b["id_b"], b["set_a"], b["set_b"]
        ):
            s1 = set(sa.split(SEP))
            s2 = set(sb.split(SEP))
            ni = len(s1 & s2)
            union = len(s1) + len(s2) - ni
            jp = (1_000_000 * ni) // union
            if jp >= threshold_ppm:
                out_a.append(int(a))
                out_b.append(int(bb))
                inter.append(ni)
                jac.append(jp)
        # typed arrow output: a batch where EVERY candidate fails
        # verification must still carry the schema (zero-row pandas
        # blocks go schema-less through Ray — repo landmine)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "n_inter": pa.array(inter, pa.int64()),
                "jac_ppm": pa.array(jac, pa.int64()),
            }
        )

    return joined.map_batches(verify, batch_format="pandas")


def hard_negatives(
    ds,
    queries: np.ndarray,
    query_labels,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
):
    """Hard-negative mining for contrastive training: for each query
    vector, the top-``k`` most-similar corpus vectors with a
    DIFFERENT label. Same one-scan broadcast-matmul shape as
    :func:`multi_knn` — the (q, d) query matrix and its labels ride
    the closure once; the label mask is a vectorized (n, q) compare
    inside the block, so labels never shuffle. Same rounded-cosine /
    id-ascending tie discipline, so the DuckDB oracle reproduces the
    result exactly (``WHERE e.label != q.label`` + ROW_NUMBER)."""
    from ocr_service_ray.ops.relational import grouped_topk

    q = queries.astype(np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    nq = q.shape[0]
    qlab = np.asarray(query_labels)

    def score(b: pa.Table) -> pa.Table:
        mat = _as_matrix(b[vec_col])
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], b[id_col].type),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        if mat.size == 0:
            return empty
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat @ q.T) / norms[:, None] / qn[None, :], 6)
        labs = b[label_col].to_numpy(zero_copy_only=False)
        same = labs[:, None] == qlab[None, :]  # (n, q)
        sims = np.where(same, -np.inf, sims)
        n = mat.shape[0]
        kk = min(k, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        rows = part.T.reshape(-1)
        vals = sims[rows, qid]
        keep = np.isfinite(vals)  # drop masked (same-label) fillers
        return pa.table(
            {
                "query_id": pa.array(qid[keep]),
                id_col: pa.array(ids[rows][keep]),
                "cos_sim": pa.array(vals[keep], pa.float64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored, ["query_id"], ["cos_sim", id_col], k, [True, False]
    )


def ann_recall_eval(ds, index, queries: "np.ndarray", k: int = 5):
    """Recall@k of an ANN index vs exact brute force, per query — the
    index-quality gate a retrieval/dedup pipeline runs before trusting
    an approximate structure (the recall/cost trade is THE decision an
    IVF/LSH deployment makes; measured, not guessed).

    ``queries`` is a (Q, dim) matrix. Per query: exact top-k over the
    full corpus (``knn_brute`` — the expensive ground truth, which is
    exactly why the eval runs on a bounded query SAMPLE), top-k over
    the index's restricted search, recall_ppm = |∩| · 1e6 // k.
    Returns pandas (query_id, recall_ppm) ordered by query id.

    Tie discipline: both sides rank by (cos DESC, id ASC) — the
    repo-wide knn order — so recall is well-defined even at score
    ties and the whole eval is SQL-reproducible when the index's
    restriction is (LshIndex: pure arithmetic; IvfIndex needs
    recall-1 parameters for an exact oracle).
    """
    import pandas as pd

    rows = []
    for qi, q in enumerate(queries):
        brute = knn_brute(ds, np.asarray(q, dtype=np.float64), k)
        approx = index.search(np.asarray(q, dtype=np.float64), k=k)
        b_ids = set(brute.to_pandas()["vec_id"])
        a_ids = set(approx.to_pandas()["vec_id"])
        rows.append((qi, len(b_ids & a_ids) * 1_000_000 // k))
    return pd.DataFrame(rows, columns=["query_id", "recall_ppm"]).astype(
        "int64"
    )


def mmr_select(
    ds,
    query: "np.ndarray",
    k: int = 5,
    pool: int = 20,
    lam: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): a
    diverse top-k — greedily pick the candidate maximizing
    ``λ·rel − (1−λ)·max_sim_to_selected`` — the retrieval move that
    stops near-duplicate passages from filling a context window
    (RAG-dedup at serving time; the serving-side complement of
    ``ops/dedup.py``).

    Distributed part: ONE scan scores the corpus and a combiner top-k
    keeps the ``pool`` most relevant candidates (vectors ride along —
    pool-bounded, tiny). The greedy loop is driver-side over pool²
    cosines — bounded by ``pool``, never by corpus, which is the
    standard MMR deployment shape.

    Float discipline: every cosine is rounded to 6dp at the edge (the
    module-wide rule) and the score is ``(λ·rel) − ((1−λ)·maxsim)``
    with that exact parenthesization, ties → smaller id — so the SQL
    oracle replays the greedy unrolled step by step. Returns pandas
    ``(sel_order, vec_id)``, sel_order 1-based."""
    import pandas as pd

    from ocr_service_ray.ops.relational import topk

    scored = ds.map_batches(
        lambda b: cosine_to_query(b, query, vec_col).select(
            [id_col, vec_col, "cos_sim"]
        ),
        batch_format="pyarrow",
    )
    cand = topk(
        scored, ["cos_sim", id_col], pool, descending=[True, False]
    ).to_pandas()
    ids = cand[id_col].to_list()
    rel = dict(zip(ids, cand["cos_sim"]))
    vecs = {
        i: np.asarray(v, dtype=np.float64)
        for i, v in zip(ids, cand[vec_col])
    }

    def cos(a: np.ndarray, b: np.ndarray) -> float:
        na = np.linalg.norm(a) or 1.0
        nb = np.linalg.norm(b) or 1.0
        return float(np.round((a @ b) / (na * nb), 6))

    selected = [min(ids, key=lambda i: (-rel[i], i))]
    while len(selected) < min(k, len(ids)):
        best, best_sc = None, None
        for c in sorted(i for i in ids if i not in selected):
            ms = max(cos(vecs[c], vecs[s]) for s in selected)
            sc = (lam * rel[c]) - ((1.0 - lam) * ms)
            if best_sc is None or sc > best_sc:
                best, best_sc = c, sc
        selected.append(best)
    return pd.DataFrame(
        {
            "sel_order": np.arange(1, len(selected) + 1, dtype=np.int64),
            id_col: np.asarray(selected, dtype=np.int64),
        }
    )


def label_noise_audit(
    ds,
    k: int = 5,
    nbits: int = 4,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
):
    """kNN label-disagreement audit (the confident-learning /
    cleanlab move): a row whose k nearest neighbors mostly carry a
    DIFFERENT label is a mislabel candidate — the label-quality gate
    of a classifier-training pipeline.

    Scale shape: neighbors are restricted to the row's hyperplane-LSH
    cell (the ``LshIndex`` arithmetic — pure, SQL-reproducible), so
    the all-pairs cosine work is per-cell, never corpus-wide; ONE
    bucketed cell shuffle, in-cell numpy matmul. Neighbor order is
    (6dp cosine DESC, id ASC); the majority vote ties to the SMALLER
    label; rows alone in their cell have no electorate and are
    skipped. Returns pandas ``(vec_id, label, maj_label, n_votes)``
    for DISAGREEING rows only, sorted by vec_id."""
    import pandas as pd

    from ocr_service_ray.ops.agg import bucketed_map_groups

    rng = np.random.RandomState(seed)
    dim_probe = len(ds.limit(1).take(1)[0][vec_col])
    planes = rng.standard_normal((nbits, dim_probe))

    def assign(b: pa.Table) -> pa.Table:
        mat = _as_matrix(b[vec_col])
        bits = (mat @ planes.T) > 0.0
        cell = (
            bits.astype(np.int64) << np.arange(nbits, dtype=np.int64)
        ).sum(axis=1)
        return pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                label_col: b[label_col].cast(pa.int64()),
                vec_col: b[vec_col],
                "cell": pa.array(cell),
            }
        )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame | None:
        n = len(g)
        if n < 2:
            return None
        ids = g[id_col].to_numpy(dtype=np.int64)
        labels = g[label_col].to_numpy(dtype=np.int64)
        mat = np.array(g[vec_col].to_list(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat @ mat.T) / np.outer(norms, norms), 6)
        rows = []
        for i in range(n):
            order = sorted(
                (j for j in range(n) if j != i),
                key=lambda j: (-sims[i, j], ids[j]),
            )[:k]
            votes: dict = {}
            for j in order:
                votes[labels[j]] = votes.get(labels[j], 0) + 1
            maj = min(votes, key=lambda l: (-votes[l], l))
            if maj != labels[i]:
                rows.append((ids[i], labels[i], maj, len(order)))
        if not rows:
            return None
        return pd.DataFrame(
            rows, columns=[id_col, label_col, "maj_label", "n_votes"]
        )

    out = bucketed_map_groups(
        ds.map_batches(assign, batch_format="pyarrow"), ["cell"], per_cell
    ).to_pandas()
    if id_col not in out.columns:
        out = pd.DataFrame(
            {id_col: [], label_col: [], "maj_label": [], "n_votes": []}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)
