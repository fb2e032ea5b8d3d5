"""Link prediction by the resource-allocation index — integer-exact
neighbourhood scoring (Zhou, Lü & Zhang 2009; RA — Σ over common
neighbours w of 1/deg(w) — consistently beats raw common-neighbour
counts because hub neighbours carry less evidence).

Integer discipline: each shared neighbour w contributes
``floor(10⁶ / deg(w))`` — the micro-floor is applied PER NEIGHBOUR
(contractual, and what the oracle replays), so every score is an
exact integer sum, no float and no denominator juggling.

100-TB shape: pure wedge pipeline (the butterfly.py discipline) —
per node w, every pair of its neighbours receives w's contribution
(generated inside one node-keyed bucketed shuffle), a pair-keyed
combiner sums contributions, existing edges are dropped against the
broadcast edge set, and the top-k close is a block-local top-k
combiner. Hot-node fan-out is C(deg,2) — the same skew audit knob
as butterfly counting."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def ra_link_prediction(
    edges_ds, top_k: int = 10, scale: int = 1_000_000
) -> pd.DataFrame:
    """Top-k ABSENT canonical pairs by resource-allocation score over
    an undirected edge Dataset (``src``/``dst``; symmetrized +
    deduped internally). Returns ``(lo, hi, n_common, ra_micro)``
    sorted by (ra_micro desc, lo, hi)."""
    import ray

    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})

    edges = (
        grouped_agg(
            edges_ds.map_batches(canon, batch_format="pyarrow"),
            ["lo", "hi"],
            {"_c": (None, "count")},
        )
        .drop_columns(["_c"])
        .materialize()
    )
    edge_set = {(int(r["lo"]), int(r["hi"])) for r in edges.take_all()}
    es_ref = ray.put(edge_set)

    def sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "w": pa.array(np.concatenate([lo, hi])),
                "nbr": pa.array(np.concatenate([hi, lo])),
            }
        )

    adj = edges.map_batches(sym, batch_format="pyarrow")

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        vs = np.sort(g["nbr"].to_numpy())
        k = len(vs)
        if k < 2:
            return None
        contrib = scale // k  # deg(w) = k
        iu, ju = np.triu_indices(k, 1)
        return pd.DataFrame(
            {
                "lo": vs[iu],
                "hi": vs[ju],
                "c": np.full(len(iu), contrib, dtype=np.int64),
                "n": np.ones(len(iu), dtype=np.int64),
            }
        )

    wedges = bucketed_map_groups(adj, ["w"], gen_pairs)
    scored = grouped_agg(
        wedges, ["lo", "hi"], {"ra_micro": ("c", "sum"), "n_common": ("n", "sum")}
    )

    def drop_existing(b: pa.Table, es_ref=es_ref) -> pa.Table:
        es = ray.get(es_ref)
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = pa.array(
            [(int(a), int(c)) not in es for a, c in zip(lo, hi)]
        )
        return b.filter(m)

    from ocr_service_ray.ops.relational import topk

    cand = topk(
        scored.map_batches(drop_existing, batch_format="pyarrow"),
        ["ra_micro", "lo", "hi"],
        top_k,
        [True, False, False],
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame(
            {
                c: pd.array([], dtype="int64")
                for c in ("lo", "hi", "n_common", "ra_micro")
            }
        )
    return (
        cand[["lo", "hi", "n_common", "ra_micro"]]
        .reset_index(drop=True)
        .astype("int64")
    )
