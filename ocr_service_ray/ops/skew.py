"""Skew handling — salted shuffles and media-cost-aware sharding.

Two distinct skew problems exist at 10^12-doc scale, with two
different tools:

1. **Hot keys in wide ops** (a groupby/aggregate key where one value
   carries a large share of rows — e.g. ``event_type='view'``,
   ``lang='en'``). One reducer would receive that key's entire
   partition. :func:`salted_aggregate` splits every hot key across
   ``num_salts`` synthetic sub-keys (phase 1), aggregates partials,
   then re-aggregates by the true key (phase 2) — the classic
   two-phase salted aggregation. Results are EXACTLY equal to the
   direct aggregate for decomposable aggregates (count/sum/min/max).

2. **Heavy rows in actor-pool stages** (media-heavy documents that
   cost 10-100× a text-only doc). No shuffle fixes per-ROW cost; the
   flagship absorbs it with fine task granularity (small blocks, the
   streaming executor load-balances batches across the pool —
   pipelines/flagship.py). What a shuffle CAN fix is per-PARTITION
   cost for partitioned sinks/checkpoints: :func:`media_cost_column`
   estimates per-doc cost and :func:`cost_balanced_shard` assigns
   shard ids by salted cost-weighted hashing so each output partition
   carries ~equal COST, not ~equal row count (the reference's
   media_ref-keyed analogue — media_ref embeds doc_id, so hashing
   doc_id is hashing the media locality key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Per-span-kind cost weights: a pdf_page costs ~decode+OCR of a full
# page, an image slightly less, an area crop less again, text ~free.
DEFAULT_KIND_WEIGHTS = {"text": 1.0, "area": 4.0, "image": 8.0, "pdf_page": 10.0}


def _hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable per-row 64-bit hash — element-pure (ops/hashing.py;
    ``pd.util.hash_array`` is not and must not be used for keys)."""
    from ocr_service_ray.ops.hashing import hash_column

    return hash_column(arr)


def salted_aggregate(
    ds,
    key_col: str,
    num_salts: int = 16,
    *,
    count_alias: str = "n",
    sum_col: str | None = None,
    sum_alias: str = "total",
):
    """Two-phase salted count(+sum) by ``key_col``.

    Phase 1 shuffles on (key, salt) — a hot key spreads over
    ``num_salts`` reducers; phase 2 shuffles only the tiny partial
    table on the true key. Exact: count/sum are decomposable.
    The salt is derived from a row-content hash (here: the key of the
    row's position within its batch), NOT random — reruns are
    deterministic.
    """
    from ocr_service_ray.ops.agg import grouped_agg

    def add_salt(batch: pa.Table) -> pa.Table:
        # Deterministic row salt: position within the block mod salts.
        salt = (np.arange(batch.num_rows) % num_salts).astype(np.int32)
        return batch.append_column("_salt", pa.array(salt))

    specs = {"_pn": (sum_col, "count") if sum_col is not None else (None, "count")}
    if sum_col is not None:
        specs["_ps"] = (sum_col, "sum")
    partial = grouped_agg(
        ds.map_batches(add_salt, batch_format="pyarrow"),
        [key_col, "_salt"],
        specs,
    )
    final_specs = {count_alias: ("_pn", "sum")}
    if sum_col is not None:
        final_specs[sum_alias] = ("_ps", "sum")
    return grouped_agg(partial, [key_col], final_specs)


def media_cost_column(
    ds, spans_col: str = "spans", weights: dict[str, float] | None = None
):
    """Append ``media_cost`` — the estimated processing cost of each
    interleaved document from its span kinds (vectorized over the
    flattened span list; no Python per-row loop)."""
    weights = weights or DEFAULT_KIND_WEIGHTS

    def cost(batch: pa.Table) -> pa.Table:
        spans = batch[spans_col]
        flat = pc.list_flatten(spans)
        kinds = flat.field("kind") if hasattr(flat, "field") else flat.combine_chunks().field("kind")
        w = np.zeros(len(kinds), dtype=np.float64)
        kl = kinds.to_pylist()
        for kind, wt in weights.items():
            w[np.fromiter((k == kind for k in kl), bool, len(kl))] = wt
        offsets = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(batch.num_rows), offsets)
        doc_cost = np.zeros(batch.num_rows, dtype=np.float64)
        np.add.at(doc_cost, idx, w)
        return batch.append_column("media_cost", pa.array(doc_cost))

    return ds.map_batches(cost, batch_format="pyarrow")


def cost_balanced_shard(
    ds,
    num_shards: int,
    id_col: str = "doc_id",
    cost_col: str = "media_cost",
    heavy_quantile: float = 0.9,
    heavy_spread: int = 4,
):
    """Append ``shard`` ∈ [0, num_shards): normal docs shard by
    hash(id) (uniform in COUNT); docs above the cost quantile are
    ROUND-ROBINED across shards in cost-rank order (uniform in COST —
    pure hashing leaves heavy-doc cost unbalanced by luck of the
    draw). The quantile is estimated per batch (streaming; no global
    pass) — at scale, pass a precomputed threshold for a stable cut.
    ``heavy_spread`` rotates the round-robin start per batch so heavy
    docs of different batches don't pile on shard 0.

    Downstream: ``groupby("shard")`` / partitioned writes get
    ~cost-equal partitions (checkpoint resumability with balanced
    restart cost)."""

    def assign(batch: pa.Table) -> pa.Table:
        h = _hash64(batch[id_col])
        cost = batch[cost_col].to_numpy(zero_copy_only=False)
        thresh = np.quantile(cost, heavy_quantile) if len(cost) else 0.0
        heavy = cost > thresh
        shard = (h % np.uint64(num_shards)).astype(np.int32)
        n_heavy = int(heavy.sum())
        if n_heavy:
            # deterministic batch rotation from the first heavy doc's hash
            start = int(h[heavy][0] % np.uint64(heavy_spread))
            order = np.argsort(-cost[heavy], kind="stable")
            rr = np.empty(n_heavy, dtype=np.int32)
            rr[order] = (start + np.arange(n_heavy)) % num_shards
            shard[heavy] = rr
        return batch.append_column("shard", pa.array(shard))

    return ds.map_batches(assign, batch_format="pyarrow")


def hot_keys(ds, col: str, min_count: int | None = None) -> list:
    """Exact hot-key census for :func:`skew_join`: per-key counts via
    the combiner aggregate (|distinct keys| partials shuffle, never
    rows), keys with ``count >= min_count`` returned. Default
    threshold: 8× the mean per-key load — a key under that gains
    nothing from a broadcast path. At 10^12 rows swap this for the
    count-min sketch (ops/sketch.py): CMS overestimates give a
    candidate SUPERSET, which only enlarges the broadcast — the join
    result is unchanged because both paths are exact."""
    from ocr_service_ray.ops.agg import grouped_agg

    counts = grouped_agg(
        ds.select_columns([col]), [col], {"n": (None, "count")}
    ).to_pandas()
    if len(counts) == 0:
        return []
    if min_count is None:
        min_count = 8 * max(1, int(counts["n"].sum()) // len(counts))
    return counts[counts["n"].astype("int64") >= min_count][col].tolist()


def skew_join(
    left_ds,
    right_ds,
    on: str,
    hot: list | None = None,
    min_count: int | None = None,
    num_partitions: int | None = None,
):
    """Hybrid skew join (inner, single key): hot keys ride a BROADCAST
    path, cold keys a hash-partitioned shuffle — the classic fix for
    the key whose rows would otherwise land on one join aggregator.

    - ``right_ds`` is the dimension side: ~1 row per key by contract,
      so its hot slice (|hot| rows) broadcasts via ``ray.put`` once.
    - The fact side splits by membership in the hot set (vectorized
      ``pc.is_in`` against one broadcast array): the hot slice joins
      map-side with zero shuffle; the cold slice takes the ordinary
      hash join whose partitions are now skew-free.
    - Results are EXACTLY a plain inner join: both paths are exact and
      every key takes exactly one path.

    Costs two passes over the fact side (one per slice) + the
    detection pass — all three read the same pruned columns; point
    them at a persisted projection when the fact side is a derived
    pipeline rather than a parquet read. Columns of both outputs are
    name-sorted so the union is schema-stable."""
    import pyarrow.compute as _pc

    from ocr_service_ray.ops.relational import broadcast_join, hash_join

    if hot is None:
        hot = hot_keys(left_ds, on, min_count=min_count)

    def _norm(b: pa.Table) -> pa.Table:
        return b.select(sorted(b.column_names)).replace_schema_metadata(None)

    if not hot:
        return hash_join(
            left_ds, right_ds, on, num_partitions=num_partitions
        ).map_batches(_norm, batch_format="pyarrow")
    hot_set = pa.array(sorted(hot))

    def _split(keep_hot: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = _pc.is_in(b[on], value_set=hot_set)
            return b.filter(m if keep_hot else _pc.invert(m))

        return fn

    right_hot_df = (
        right_ds.map_batches(_split(True), batch_format="pyarrow")
        .map_batches(_norm, batch_format="pyarrow")
        .to_pandas()
    )
    hot_joined = broadcast_join(
        left_ds.map_batches(_split(True), batch_format="pyarrow"),
        right_hot_df,
        on=on,
    ).map_batches(_norm, batch_format="pyarrow")
    cold_joined = hash_join(
        left_ds.map_batches(_split(False), batch_format="pyarrow"),
        right_ds.map_batches(_split(False), batch_format="pyarrow"),
        on,
        num_partitions=num_partitions,
    ).map_batches(_norm, batch_format="pyarrow")
    return hot_joined.union(cold_joined)
