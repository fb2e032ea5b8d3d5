"""Distributed prefix scan + sequence packing.

Training-sequence packing (GPT-style concat-and-chop: concatenate all
documents in a fixed order, chop into ``max_tokens`` windows, docs may
straddle boundaries) reduces to an EXCLUSIVE PREFIX SUM of document
token counts in corpus order — the classic two-phase distributed scan:

  phase 1  one pass over the sorted, materialized input collects
           per-BLOCK (min_key, total) metadata — |blocks| rows to the
           driver, never data;
  phase 2  a second pass over the SAME blocks (materialization pins
           them) adds the block's exclusive base (binary-searched from
           the broadcast block-offset table) to a vectorized in-block
           exclusive cumsum.

The input must be sorted by a UNIQUE key (``ds.sort`` upstream — the
one all-to-all this op needs; at 100 TB the corpus is typically
already id-ordered at rest, making the sort a no-op re-read).
Uniqueness is asserted: equal keys split across block boundaries would
make "rows before mine" ambiguous.

``pack_sequences`` then emits, per document, its token span in the
packed stream — ``(start_offset, first_seq, last_seq)`` — which is
all a loader needs to build any sequence shard independently:
sequence s = tokens [s*max_tokens, (s+1)*max_tokens), provided by the
docs whose span intersects it. The DuckDB oracle mirrors the whole
thing with a window SUM.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def prefix_sum(sorted_ds, key_col: str, value_col: str, out_col: str = "offset"):
    """Adds ``out_col`` = exclusive prefix sum of ``value_col`` in
    ``key_col`` order. ``sorted_ds`` MUST be sorted by ``key_col``
    (unique keys). Returns a Dataset over the same rows."""
    mat = sorted_ds.materialize()

    def block_meta(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "min_key": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                }
            )
        v = b[value_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "min_key": pa.array([b[key_col][0].as_py()]),
                "total": pa.array([int(v.sum())], pa.int64()),
            }
        )

    # phase 1: |blocks| metadata rows — data never moves
    meta = (
        mat.map_batches(block_meta, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("min_key")
        .reset_index(drop=True)
    )
    if len(meta) == 0:
        return mat
    assert meta["min_key"].is_unique, (
        "prefix_sum requires a unique sort key (equal keys split "
        "across blocks are ambiguous)"
    )
    block_keys = meta["min_key"].to_numpy()
    bases = np.concatenate(([0], meta["total"].cumsum().to_numpy()[:-1]))

    def add_offset(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        first = b[key_col][0].as_py()
        i = int(np.searchsorted(block_keys, first, side="left"))
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        local = np.concatenate(([0], np.cumsum(v)[:-1]))
        return b.append_column(out_col, pa.array(bases[i] + local))

    # phase 2 over the SAME materialized blocks (batch_size=None: one
    # batch per block — the contract that makes the base lookup exact)
    return mat.map_batches(add_offset, batch_format="pyarrow", batch_size=None)


def pack_sequences(
    ds,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document placement in the concat-and-chop packed stream
    (docs in ``id_col`` order): ``(doc_id, n_tokens, start_offset,
    first_seq, last_seq)``."""
    import pyarrow.compute as pc

    def lengths(b: pa.Table) -> pa.Table:
        nt = pc.cast(pc.add(pc.count_substring(b[text_col], " "), 1), pa.int64())
        return pa.table({id_col: b[id_col], "n_tokens": nt})

    sized = ds.map_batches(lengths, batch_format="pyarrow").sort(id_col)
    placed = prefix_sum(sized, id_col, "n_tokens", out_col="start_offset")

    def spans(b: pa.Table) -> pa.Table:
        off = b["start_offset"].to_numpy(zero_copy_only=False)
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": b["n_tokens"],
                "start_offset": b["start_offset"],
                "first_seq": pa.array(off // max_tokens),
                "last_seq": pa.array((off + nt - 1) // max_tokens),
            }
        )

    return placed.map_batches(spans, batch_format="pyarrow")


def weighted_systematic_sample(
    ds,
    key_col: str,
    weight_col: str,
    step: int,
):
    """Deterministic sampling with probability proportional to an
    INTEGER weight — systematic (fixed-interval) sampling on the
    cumulative-weight line: rows are laid end-to-end in ``key_col``
    order (the prefix scan above), and a row is selected iff a
    sampling tick (a multiple of ``step``) falls inside its
    ``[offset, offset + w)`` interval. Selection rate = w/step per
    row, total sample ≈ Σw/step, zero RNG state: the SAME rows are
    chosen on any cluster/layout/run, the sample composes with
    resume, and the predicate is pure integer arithmetic —
    ``⌊(off+w-1+step)/step⌋ ≠ ⌊(off-1+step)/step⌋`` (the +step shift
    keeps operands non-negative so floor division is
    engine-agnostic) — which a SQL window SUM reproduces exactly.

    Weight-0 rows are never selected; rows with w ≥ step are always
    selected (the classic PPS guarantee)."""
    placed = prefix_sum(ds.sort(key_col), key_col, weight_col, out_col="_off")

    def select(b: pa.Table) -> pa.Table:
        off = b["_off"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = (off + w - 1 + step) // step
        lo = (off - 1 + step) // step
        return b.filter(pa.array(hi != lo)).drop_columns(["_off"])

    return placed.map_batches(select, batch_format="pyarrow", batch_size=None)


def global_rank(ds, by: list[str], out_col: str = "rank"):
    """Dense 0-based global row rank in ``by`` order — the
    sorted-export / leaderboard shape (``row_number() OVER (ORDER BY
    ...)``) over the whole corpus.

    The one genuine all-to-all here is Ray's distributed ``sort``
    (sample → range-partition → per-block sort); ranks are then
    assigned with the same two-phase block-offset scan as
    ``prefix_sum``: phase 1 pulls |blocks| (first_key, n_rows)
    metadata rows to the driver (never data), phase 2 adds each
    block's exclusive row base to an in-block arange. The composite
    ``by`` key must be UNIQUE per row (append an id column last) —
    asserted, since equal keys split across block boundaries make
    "rows before mine" ambiguous."""
    mat = ds.sort(by).materialize()

    def block_meta(b: pa.Table) -> pa.Table:
        # one row per block: the block's FIRST row's sort-key values
        # (blocks out of a sort hold disjoint contiguous key ranges,
        # so first keys order the blocks) + the block's row count
        if len(b) == 0:
            return b.select(by).append_column("_n", pa.array([], pa.int64()))
        return b.select(by).slice(0, 1).append_column(
            "_n", pa.array([len(b)], pa.int64())
        )

    meta = mat.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if len(meta) == 0:
        # schema-stable empty result: still carries the rank column
        return mat.map_batches(
            lambda b: b.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    meta = meta.sort_values(by).reset_index(drop=True)
    assert not meta.duplicated(by).any(), (
        "global_rank requires a unique composite sort key "
        "(append a unique id column last)"
    )
    block_bases = np.concatenate(([0], meta["_n"].cumsum().to_numpy()[:-1]))
    bases = {
        tuple(row): int(base)
        for row, base in zip(meta[by].itertuples(index=False), block_bases)
    }

    def add_rank(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        base = bases[tuple(b[c][0].as_py() for c in by)]
        return b.append_column(
            out_col, pa.array(base + np.arange(len(b), dtype=np.int64))
        )

    return mat.map_batches(add_rank, batch_format="pyarrow", batch_size=None)


def zorder_key(ds, cols: list[str], bits: int = 16, out_col: str = "z_key"):
    """Morton / z-order interleave key over non-negative integer
    columns — the multi-dimensional CLUSTERING primitive (Delta/Iceberg
    OPTIMIZE ZORDER): range-partitioning or sorting by ``z_key`` keeps
    rows close in EVERY listed dimension physically together, so
    min/max column statistics prune multi-predicate scans — the
    100-TB layout step before writing partitioned parquet.

    Each column contributes its low ``bits`` bits (values are masked
    to ``bits`` — pre-scale/bucket wider domains; callers own the
    normalization, the key is only as balanced as its inputs).
    Vectorized: ``bits * len(cols)`` numpy shift/or passes per batch,
    zero Python per row; streaming map, zero shuffle — the downstream
    ``sort``/``repartition`` is where the exchange happens, exactly
    once, on an int64 key. Pure integer bit arithmetic: SQL reproduces
    the key with ``(x // 2^i) % 2`` terms.

    Raises on > 64 total bits (int64 overflow) or negative inputs
    (two's-complement masking would diverge from SQL ``%``).
    """
    import pyarrow.compute as pc

    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds int64")
    mask = np.uint64((1 << bits) - 1)
    stride = len(cols)

    def add_key(b: pa.Table) -> pa.Table:
        out = np.zeros(len(b), dtype=np.uint64)
        for j, c in enumerate(cols):
            x = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(x) and x.min() < 0:
                raise ValueError(f"zorder_key needs non-negative ints; {c} has negatives")
            v = x.view(np.uint64) & mask
            for i in range(bits):
                out |= ((v >> np.uint64(i)) & np.uint64(1)) << np.uint64(i * stride + j)
        return b.append_column(out_col, pa.array(out.view(np.int64)))

    return ds.map_batches(add_key, batch_format="pyarrow")


def running_max(ds, key_col: str, value_col: str, out_col: str = "running_max"):
    """Inclusive global running max of ``value_col`` in ``key_col``
    order — the event-time watermark shape (how far has time
    progressed as of each arrival). Same two-phase discipline as
    ``prefix_sum``: sort by the key, |blocks| (min_key, block_max)
    metadata rows to the driver, exclusive prefix-max as per-block
    bases, vectorized in-block cummax. Data crosses the wire once
    (the sort); the driver sees block METADATA only."""
    mat = ds.sort(key_col).materialize()

    def block_meta(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"min_key": pa.array([], pa.int64()), "vmax": pa.array([], pa.int64())}
            )
        v = b[value_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "min_key": pa.array([b[key_col][0].as_py()]),
                "vmax": pa.array([int(v.max())], pa.int64()),
            }
        )

    meta = (
        mat.map_batches(block_meta, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("min_key")
        .reset_index(drop=True)
    )
    if len(meta) == 0:
        return mat
    block_keys = meta["min_key"].to_numpy()
    cmax = meta["vmax"].cummax().to_numpy()
    int_min = np.iinfo(np.int64).min
    bases = np.concatenate(([int_min], cmax[:-1]))

    def add_running(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        first = b[key_col][0].as_py()
        i = int(np.searchsorted(block_keys, first, side="left"))
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        run = np.maximum(np.maximum.accumulate(v), bases[i])
        return b.append_column(out_col, pa.array(run))

    return mat.map_batches(add_running, batch_format="pyarrow")
