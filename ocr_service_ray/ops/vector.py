"""Vector-column aggregation — per-group embedding centroids.

The embedding layer of a curation pipeline needs per-class/per-cluster
centroids (IVF training, class prototypes, drift monitoring) over a
``list<float>`` column. Elementwise sums are decomposable, so the op
is combiner-shaped: each block collapses to ≤ |groups| × dim exploded
``(group, dim, sum, n)`` partial rows (vectorized ``np.add.at`` over
the block's flattened vectors), and one ``grouped_agg`` merges them —
the shuffle moves group×dim partials, never vectors.

Oracle determinism: float summation is association-order-dependent,
so the oracled path sums MICRO-INTS (each element ×1e6, half-up) —
exact under any association on both engines (the repo-wide
discipline). ``centroids()`` divides back out driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _flat_vectors(col) -> np.ndarray:
    """(n, dim) float64 view of a fixed-dim list<float> column."""
    chunk = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(chunk.flatten(), dtype=np.float64)
    return flat.reshape(len(chunk), -1)


def grouped_vector_sum(
    ds,
    group_col: str,
    vec_col: str = "embedding",
    micro: bool = True,
):
    """Dataset ``(group, dim, vsum, n)`` — elementwise vector sum and
    member count per group. ``micro=True`` (the oracled contract)
    sums ``floor(v*1e6 + 0.5)`` int64s; ``micro=False`` sums raw
    floats (production path; not association-exact)."""
    from ocr_service_ray.ops.agg import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        vecs = _flat_vectors(b[vec_col])
        n_rows, dim = vecs.shape if vecs.size else (0, 0)
        if n_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], b[group_col].type),
                    "dim": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.int64() if micro else pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        if micro:
            vecs = np.floor(vecs * 1000000.0 + 0.5).astype(np.int64)
        groups, codes = np.unique(
            b[group_col].to_numpy(zero_copy_only=False), return_inverse=True
        )
        sums = np.zeros((len(groups), dim), dtype=vecs.dtype)
        np.add.at(sums, codes, vecs)
        counts = np.bincount(codes, minlength=len(groups))
        g_rep = np.repeat(groups, dim)
        return pa.table(
            {
                group_col: pa.array(g_rep, b[group_col].type),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(groups))),
                "vsum": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts, dim).astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(
        partials,
        [group_col, "dim"],
        {"vsum": ("vsum", "sum"), "n": ("n", "sum")},
    )


def centroids(ds, group_col: str, vec_col: str = "embedding") -> pd.DataFrame:
    """Per-group mean vectors as a driver-side DataFrame
    ``group → np.ndarray(dim)`` (groups × dim is small by contract)."""
    t = grouped_vector_sum(ds, group_col, vec_col, micro=False).to_pandas()
    out = {}
    for g, sub in t.groupby(group_col):
        sub = sub.sort_values("dim")
        out[g] = sub["vsum"].to_numpy() / sub["n"].to_numpy()
    return pd.DataFrame(
        {group_col: list(out), "centroid": [out[g] for g in out]}
    )


def embedding_minmax(ds, vec_col: str = "embedding") -> pd.DataFrame:
    """Per-dimension global (min, max) of a fixed-dim ``list<float>``
    column — combiner-shaped: each block collapses to dim rows of
    partial (mn, mx) and one ``grouped_agg`` merges (min/max are
    decomposable and EXACT on floats, no association issues).
    Returns a DataFrame (dim, mn, mx), dim 1-based (SQL
    ``generate_subscripts`` convention)."""
    from ocr_service_ray.ops.agg import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        vecs = _flat_vectors(b[vec_col])
        if vecs.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.float64()),
                    "mx": pa.array([], pa.float64()),
                }
            )
        dim = vecs.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
                "mn": pa.array(vecs.min(axis=0)),
                "mx": pa.array(vecs.max(axis=0)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(
        partials, ["dim"], {"mn": ("mn", "min"), "mx": ("mx", "max")}
    ).to_pandas()


def quantize_embeddings(ds, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Scalar int8-range quantization of an embedding column — the
    storage-compression step before ANN indexing at corpus scale
    (4 bytes/dim → 1). Two passes: per-dim global (min, max) via the
    combiner (dim-bounded partials), broadcast once; then a streaming
    vectorized map computes ``q = min(floor((v - mn) * 255 / (mx -
    mn)), 255)`` per element (``q = 0`` where mx == mn). All float64
    +,-,×,÷,floor — IEEE-exact cross-engine, so the DuckDB oracle
    replays it bit-for-bit from the same arithmetic.

    Output EXPLODED (id_col, dim, q) int64 rows, dim 1-based —
    positionally zips with SQL parallel unnest/generate_subscripts.
    (Exploding multiplies rows by dim; at corpus scale keep the list
    layout by reshaping q in-kernel instead — the exploded form here
    is the oracle-comparable surface.)"""
    import ray

    stats = embedding_minmax(ds, vec_col).sort_values("dim")
    mn = stats["mn"].to_numpy(dtype=np.float64)
    mx = stats["mx"].to_numpy(dtype=np.float64)
    stats_ref = ray.put((mn, mx))

    def kernel(b: pa.Table) -> pa.Table:
        mn_b, mx_b = ray.get(stats_ref)
        vecs = _flat_vectors(b[vec_col])
        n_rows = vecs.shape[0] if vecs.size else 0
        if n_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], b[id_col].type),
                    "dim": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        dim = vecs.shape[1]
        span = mx_b - mn_b
        safe = np.where(span > 0.0, span, 1.0)
        q = np.minimum(np.floor((vecs - mn_b) * 255.0 / safe), 255.0)
        q = np.where(span > 0.0, q, 0.0).astype(np.int64)
        ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), dim)
        return pa.table(
            {
                id_col: pa.array(ids, b[id_col].type),
                "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), n_rows)),
                "q": pa.array(q.ravel()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def hash_project_quantized(ds, n_out: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Feature-hashing projection: compress int8-quantized embeddings
    to ``n_out`` integer components with deterministic ±1 md5 weights
    (the hashing trick / signed random projection, RNG-free so the
    projection is identical on every run AND reproducible in SQL).

    proj[j] = sum over dims of w(dim, j) * q(dim),
    w(dim, j) = +1 if the first hex digit of md5("dim:j") < 8 else -1.

    Built on ``quantize_embeddings``'s exploded (id, dim, q) rows:
    each row expands to ``n_out`` weighted COLUMNS (not rows), then
    one combiner ``grouped_agg`` sums per id — the shuffle moves
    n_out ints per (id, dim), no row explosion. |proj| <= 255 * dims,
    far inside int64."""
    import hashlib

    from .agg import grouped_agg

    def _w(dim: int, j: int) -> int:
        return 1 if int(hashlib.md5(f"{dim}:{j}".encode()).hexdigest()[0], 16) < 8 else -1

    exploded = quantize_embeddings(ds, vec_col=vec_col, id_col=id_col)
    w_cache: dict = {}

    def weight_matrix(max_dim: int) -> np.ndarray:
        if max_dim not in w_cache:
            w_cache[max_dim] = np.array(
                [[_w(d, j) for j in range(n_out)] for d in range(max_dim + 1)],
                dtype=np.int64,
            )
        return w_cache[max_dim]

    def contribs(b: pa.Table) -> pa.Table:
        dim = b["dim"].to_numpy(zero_copy_only=False)
        q = b["q"].to_numpy(zero_copy_only=False)
        w = weight_matrix(int(dim.max()) if len(dim) else 0)
        cols = {id_col: b[id_col]}
        for j in range(n_out):
            cols[f"p{j}"] = pa.array(w[dim, j] * q)
        return pa.table(cols)

    return grouped_agg(
        exploded.map_batches(contribs, batch_format="pyarrow"),
        [id_col],
        {f"p{j}": (f"p{j}", "sum") for j in range(n_out)},
    )


def centroid_cosine_pairs(
    ds, group_col: str, vec_col: str = "embedding", scale: int = 1_000_000
) -> pd.DataFrame:
    """Pairwise cosine similarity between per-group embedding
    centroids, exact — the class-prototype confusion map (which
    labels' mean embeddings point the same way) behind mixture design
    and label-noise audits.

    Exactness trick: centroid = vsum/n, and cosine is scale-invariant,
    so cos(centroid_a, centroid_b) = cos(vsum_a, vsum_b) — the member
    counts cancel. With micro-quantized integer element sums (the
    ``grouped_vector_sum`` oracle contract) both the dot product and
    the squared norms are exact bigints, and the reported value is the
    SIGNED SQUARED cosine in ppm (sqrt-free, the same discipline as
    lag1_autocorr):

        cos2_ppm = sign(dot) * floor( scale * dot^2
                                      / (|a|^2 * |b|^2) )

    Distribution: the data-parallel part is ``grouped_vector_sum``
    (vectors never shuffle — blocks collapse to |groups| x dim partial
    sums); the pairwise close runs on the groups x dim driver frame
    (small by contract). Zero-norm groups drop out."""
    t = grouped_vector_sum(ds, group_col, vec_col, micro=True).to_pandas()
    vecs: dict = {}
    for g, sub in t.groupby(group_col):
        sub = sub.sort_values("dim")
        vecs[g] = [int(v) for v in sub["vsum"]]
    keys = sorted(vecs)
    rows = []
    for i, a in enumerate(keys):
        na = sum(v * v for v in vecs[a])
        if na == 0:
            continue
        for b in keys[i + 1 :]:
            nb = sum(v * v for v in vecs[b])
            if nb == 0:
                continue
            dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            mag = (scale * dot * dot) // (na * nb)
            rows.append(
                {
                    "group_a": a,
                    "group_b": b,
                    "cos2_ppm": mag if dot >= 0 else -mag,
                }
            )
    out = pd.DataFrame(rows, columns=["group_a", "group_b", "cos2_ppm"])
    if len(out):
        out["cos2_ppm"] = out["cos2_ppm"].astype("int64")
    return out


def label_dispersion(ds, group_col: str, vec_col: str = "embedding"):
    """Per-group intra-class scatter of an embedding column, exact —
    the unnormalized trace of the within-class covariance, i.e. the
    mean pairwise squared distance numerator, from two moment sums
    (no pairwise pass):

        Σ_{i,j} ||q_i - q_j||² / 2 = n·Σ||q_i||² - ||Σq_i||²  =: D
        mean_pd2_micro = floor( 2·D / (n² · 1e6) )

    with q the micro-quantized integer vectors (the
    ``grouped_vector_sum`` oracle contract), so D is an exact bigint
    and ``mean_pd2_micro`` is the mean pairwise squared distance in
    micro-(original-unit²). The compactness signal behind label-noise
    and cluster-quality audits (small = tight class).

    Distribution: vectors never shuffle — each block collapses to
    per-group (Σ||q||², n) partials plus the |groups|×dim vsum
    partials; two combiner merges; bigint close per group.
    Returns a DataFrame (group, n, scatter_num, mean_pd2_micro)."""
    from ocr_service_ray.ops.agg import grouped_agg

    def norm_partial(b: pa.Table) -> pa.Table:
        vecs = _flat_vectors(b[vec_col])
        if vecs.size == 0:
            return pa.table(
                {
                    group_col: pa.array([], b[group_col].type),
                    "s2": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        q = np.floor(vecs * 1000000.0 + 0.5).astype(np.int64)
        s2 = (q * q).sum(axis=1)
        return pa.table(
            {
                group_col: b[group_col],
                "s2": pa.array(s2),
                "n": pa.array(np.ones(len(s2), dtype=np.int64)),
            }
        )

    moments = (
        grouped_agg(
            ds.map_batches(norm_partial, batch_format="pyarrow"),
            [group_col],
            {"s2": ("s2", "sum"), "n": ("n", "sum")},
        )
        .to_pandas()
        .set_index(group_col)
    )
    vsums = grouped_vector_sum(ds, group_col, vec_col, micro=True).to_pandas()
    v2 = {
        g: sum(int(v) * int(v) for v in sub["vsum"])
        for g, sub in vsums.groupby(group_col)
    }
    rows = []
    for g, r in moments.iterrows():
        n, s2 = int(r["n"]), int(r["s2"])
        d = n * s2 - v2[g]
        rows.append(
            {
                group_col: g,
                "n": n,
                "scatter_num": d,
                "mean_pd2_micro": (2 * d) // (n * n * 1_000_000),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n", "scatter_num", "mean_pd2_micro"):
        out[c] = out[c].astype("int64")
    return out


def quantization_error_audit(ds, vec_col: str = "embedding"):
    """Per-dimension reconstruction error of the int8 scalar
    quantization (``quantize_embeddings``' exact arithmetic) — the
    audit that decides whether 4→1 byte compression is safe for a
    given embedding family BEFORE re-indexing the corpus. For every
    element: ``q = min(floor((x − mn)·255 / (mx − mn)), 255)``,
    dequantized ``x' = mn + q·(mx − mn)/255``, and the per-dim sum of
    pico-int squared errors ``floor(err²·1e12 + 0.5)`` (integer
    partials — layout-invariant; err ≈ range/255 needs the 1e12
    scale, micro would quantize it away).

    Combiner-shaped: min/max pass (dim-bounded) + one streaming map
    collapsing each block to dim partial rows. Returns pandas
    ``(dim, n_rows, sse_pico)``, dim 1-based."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    stats = embedding_minmax(ds, vec_col).sort_values("dim")
    mn = stats["mn"].to_numpy(dtype=np.float64)
    mx = stats["mx"].to_numpy(dtype=np.float64)
    stats_ref = ray.put((mn, mx))

    def kernel(b: pa.Table) -> pa.Table:
        mn_b, mx_b = ray.get(stats_ref)
        vecs = _flat_vectors(b[vec_col])
        if vecs.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sse": pa.array([], pa.int64()),
                }
            )
        dim = vecs.shape[1]
        span = mx_b - mn_b
        safe = np.where(span > 0.0, span, 1.0)
        q = np.minimum(np.floor((vecs - mn_b) * 255.0 / safe), 255.0)
        q = np.where(span > 0.0, q, 0.0)
        xp = mn_b + (q * span) / 255.0
        err = vecs - xp
        sse = np.floor(err * err * 1_000_000_000_000.0 + 0.5).astype(
            np.int64
        ).sum(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
                "n": pa.array(np.full(dim, len(vecs), dtype=np.int64)),
                "sse": pa.array(sse),
            }
        )

    out = grouped_agg(
        ds.map_batches(kernel, batch_format="pyarrow"),
        ["dim"],
        {"n_rows": ("n", "sum"), "sse_pico": ("sse", "sum")},
    ).to_pandas()
    for c in ("dim", "n_rows", "sse_pico"):
        out[c] = out[c].astype("int64")
    return out.sort_values("dim").reset_index(drop=True)
