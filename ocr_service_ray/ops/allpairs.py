"""Exact all-pairs weighted-cosine similarity via a term-keyed
inverted join (the DISCO / "all-pairs similarity search" shape) —
the tf-WEIGHTED complement of the set-based PPJoin in
`ops/similarity.jaccard_pair_join`.

100-TB shape: documents explode to (doc, term, tf) rows once; a df
combiner prices every term; terms with df > ``max_df`` are DROPPED —
the standard stopword/ubiquitous-term cap that bounds per-term pair
fan-out at max_df^2 (this is the skew control: the hot-key pair
explosion never happens, and the df rule is replayed by the SQL
oracle so the capped cosine is exactly reproducible). Pair partial
products are generated per term via one bucketed key shuffle, folded
to exact integer dot products by a (id_a, id_b) combiner; norms come
from the same capped projection, so the score is the true cosine of
the capped vectors. The threshold compares squares cross-multiplied
— 1e6 * dot^2 >= t2_ppm * nn_a * nn_b — so no sqrt or float forms.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg
from ocr_service_ray.ops.relational import hash_join

__all__ = ["sparse_cosine_pairs"]


def sparse_cosine_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 50,
    t2_ppm: int = 40_000,
    stats_path: str | None = None,
):
    """Dataset of (id_a, id_b, dot, nn_a, nn_b, cos2_ppm), id_a <
    id_b, for every doc pair whose capped-vocabulary cosine^2 >=
    t2_ppm/1e6. Tokenization is a plain single-space split (the
    tfidf-family convention, empties kept).

    The capped (doc, term, tf) projection feeds THREE consumers
    (norms, pair generation, and its own df join), so it is pinned
    once instead of re-deriving the explode+join chain per consumer:
    in the object store by default, or as parquet under
    ``stats_path`` for corpus scale where O(doc-term) rows must not
    pin cluster memory — the `ops/dedup.signature_path` /
    `ops/ranking.bm25 stats_path` storage-tier contract."""

    def explode_tf(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for key, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for term, tf in Counter(t.split(" ")).items():
                ids.append(key)
                terms.append(term)
                tfs.append(tf)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tf_rows = ds.map_batches(explode_tf, batch_format="pyarrow")
    df_ds = grouped_agg(tf_rows, ["term"], {"df": (None, "count")})
    # repartition: combiner empty-block acero landmine (ranking.py)
    capped = hash_join(tf_rows, df_ds.repartition(4), on="term")

    def df_filter(b: pa.Table) -> pa.Table:
        df = b["df"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(df <= max_df))

    capped = capped.map_batches(df_filter, batch_format="pyarrow")
    if stats_path is not None:
        import ray.data as rd

        from ocr_service_ray.sources.sinks import write_parquet_sized

        write_parquet_sized(capped, stats_path)
        capped = rd.read_parquet(stats_path)
    else:
        capped = capped.materialize()

    def norm_rows(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: b[id_col], "sq": pa.array(tf * tf)})

    norms = grouped_agg(
        capped.map_batches(norm_rows, batch_format="pyarrow"),
        [id_col],
        {"nn": ("sq", "sum")},
    )

    def pair_partials(g: pd.DataFrame):
        n = len(g)
        if n < 2:
            return None
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        tf = g["tf"].to_numpy().astype(np.int64)
        iu, ju = np.triu_indices(n, k=1)
        return pd.DataFrame(
            {
                "id_a": ids[iu],
                "id_b": ids[ju],
                "p": tf[iu] * tf[ju],
            }
        ).astype("int64")

    partials = bucketed_map_groups(
        capped.select_columns(["term", id_col, "tf"]),
        ["term"],
        pair_partials,
    )
    dots = grouped_agg(
        partials, ["id_a", "id_b"], {"dot": ("p", "sum")}
    ).materialize()
    # a corpus with NO candidate pairs leaves dots fully empty and
    # schema-less; the downstream acero join then dies with "No
    # match for FieldRef id_a" (hypothesis-found 2-doc case). The
    # candidate table is the op's bounded intermediate, so
    # materialize + short-circuit is the honest guard.
    if dots.count() == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "dot": pa.array([], pa.int64()),
                    "nn_a": pa.array([], pa.int64()),
                    "nn_b": pa.array([], pa.int64()),
                    "cos2_ppm": pa.array([], pa.int64()),
                }
            )
        )

    def na(b: pa.Table) -> pa.Table:
        return pa.table({"id_a": b[id_col], "nn_a": b["nn"]})

    def nb(b: pa.Table) -> pa.Table:
        return pa.table({"id_b": b[id_col], "nn_b": b["nn"]})

    joined = hash_join(
        # repartition between the chained joins: an empty join
        # partition emits a zero-column block and the second acero
        # join then fails with "No match ... FieldRef id_a" (the
        # relational.py landmine; surfaced by a 2-doc hypothesis
        # case). A real exchange rebuilds blocks with the schema.
        hash_join(
            dots, norms.map_batches(na, batch_format="pyarrow"), on="id_a"
        ).repartition(4),
        norms.map_batches(nb, batch_format="pyarrow"),
        on="id_b",
    )

    def close(b: pa.Table) -> pa.Table:
        dot = b["dot"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn_a = b["nn_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn_b = b["nn_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lhs = 1_000_000 * dot * dot
        rhs = t2_ppm * nn_a * nn_b
        keep = lhs >= rhs
        t = b.filter(pa.array(keep))
        cos2 = lhs[keep] // (nn_a[keep] * nn_b[keep])
        return pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "dot": t["dot"],
                "nn_a": t["nn_a"],
                "nn_b": t["nn_b"],
                "cos2_ppm": pa.array(cos2),
            }
        )

    return joined.map_batches(close, batch_format="pyarrow")
