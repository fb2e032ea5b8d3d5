"""Cross-source vocabulary overlap matrix (pairwise Jaccard).

The corpus-composition diagnostic: how much do two sources' token
vocabularies overlap? For every source pair emits

    (src_a, src_b, n_shared, n_a, n_b, jaccard_ppm)

with jaccard_ppm = n_shared * 10^6 // (n_a + n_b - n_shared) — exact
integer floor, SQL-reproducible.

Scale shape: tokens explode once and dedup per (source, token) in a
combiner agg, so the shuffle is vocabulary-bounded per source, never
corpus-bounded; per-token source pairs are bounded by |sources| (the
same per-gram pairing as the source-similarity graph in
``source_pagerank``); the matrix itself is |sources|^2 rows. Hot
tokens shared by every source cost |sources|^2 pairs each — prune
stopword-grade tokens upstream if |sources| is large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import grouped_agg


def vocab_overlap_matrix(
    ds,
    source_col: str = "source",
    text_col: str = "text",
    as_dataset: bool = False,
):
    """Pairwise Jaccard of single-space-split token vocabularies.

    ``as_dataset=False`` (default) returns the convenience driver
    DataFrame — fine while |sources|² is dimension-sized.
    ``as_dataset=True`` returns the pair **Dataset** instead: the
    |sources|² matrix never visits the driver (the only driver pull is
    the |sources|-bounded per-source vocabulary-size table, broadcast
    once), which is the right form when sources number ~10⁴ and the
    matrix is ~10⁸ rows. Same columns, same values (pytest-asserted
    equality of both forms); the Dataset form carries no row order."""

    def explode(b: pa.Table) -> pa.Table:
        srcs, toks = [], []
        for s, t in zip(b[source_col].to_pylist(), b[text_col].to_pylist()):
            parts = set((t or "").split(" "))
            srcs.extend([s] * len(parts))
            toks.extend(parts)
        return pa.table(
            {"src": pa.array(srcs, type=b[source_col].type), "tok": pa.array(toks)}
        )

    st = grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["src", "tok"],
        {"_c": (None, "count")},
    )
    sizes = grouped_agg(st, ["src"], {"n": (None, "count")}).to_pandas()
    n_of = dict(zip(sizes["src"], sizes["n"].astype(int)))

    # per-token source pairs via the whole-bucket vectorized emitter
    # (distinct-token count is vocabulary-bounded here but corpus-
    # bounded in the shingle variants — per-group dispatch trap)
    from .agg import emit_group_pairs

    shared_ds = grouped_agg(
        emit_group_pairs(st, ["tok"], "src", "src_a", "src_b"),
        ["src_a", "src_b"],
        {"n_shared": (None, "count")},
    )
    if as_dataset:
        import ray

        from .pool import bcast_stage, measured_nbytes

        n_ref = ray.put(n_of)

        class Finish:
            def __init__(self):
                self.n_of = ray.get(n_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                na = (
                    pd.Series(b["src_a"].to_pylist())
                    .map(self.n_of)
                    .to_numpy(dtype=np.int64)
                )
                nb = (
                    pd.Series(b["src_b"].to_pylist())
                    .map(self.n_of)
                    .to_numpy(dtype=np.int64)
                )
                ns = b["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
                jac = ns * 1_000_000 // (na + nb - ns)
                return pa.table(
                    {
                        "src_a": b["src_a"],
                        "src_b": b["src_b"],
                        "n_shared": pa.array(ns),
                        "n_a": pa.array(na),
                        "n_b": pa.array(nb),
                        "jaccard_ppm": pa.array(jac),
                    }
                )

        return bcast_stage(shared_ds, Finish, measured_nbytes(n_of))
    shared = shared_ds.to_pandas()
    shared["n_a"] = shared["src_a"].map(n_of).astype("int64")
    shared["n_b"] = shared["src_b"].map(n_of).astype("int64")
    union = shared["n_a"] + shared["n_b"] - shared["n_shared"]
    shared["jaccard_ppm"] = (
        shared["n_shared"].to_numpy(dtype=np.int64) * 1_000_000
        // union.to_numpy(dtype=np.int64)
    )
    return shared.astype({"n_shared": "int64", "jaccard_ppm": "int64"})
