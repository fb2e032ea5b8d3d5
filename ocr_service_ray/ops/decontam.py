"""Train/eval decontamination — cross-corpus n-gram overlap.

The benchmark-leakage check every training-data pipeline runs before
a model sees the corpus: find TRAIN documents that share a token
n-gram with any EVAL/benchmark document (the GPT-3/Dolma-style n-gram
decontamination rule), report the overlapping (train, eval) pairs
with their shared-gram counts, and optionally drop the train side.

Shapes (100 TB train, thousands-of-docs eval — the real asymmetry):

- ``strategy="broadcast"`` (default): the EVAL gram set is tiny by
  construction (benchmarks are small); it goes to the object store
  once and the train corpus is scanned exactly once with an
  in-kernel membership probe — NO shuffle anywhere. This is the
  production path.
- ``strategy="shuffle"``: both sides become per-doc-distinct
  ``(id, gram_hash)`` tables and meet in ONE hash join keyed by the
  gram hash (moves gram rows, never text), followed by a combiner
  pair-count. For the hypothetical eval set too large to broadcast.
- ``strategy="bloom"``: the shuffle strategy with a Bloom prefilter
  in front of the join — the eval gram set is folded into ``m`` bits
  (built distributed, OR-merged driver-side: the bits are O(m)
  regardless of eval size), broadcast once, and the TRAIN gram rows
  that the filter rejects never enter the shuffle. False positives
  are removed by the exact join (they simply find no partner), so
  the output is EXACTLY the other strategies' — the filter only
  shrinks the exchange, by ~the non-contaminated fraction.

All three return identical values (asserted in tests); gram hashing and
tokenization follow ``ops/ngrams.py`` (single-space split, md5 of the
space-joined gram) so the DuckDB oracle rebuilds the whole check in
SQL.
"""

from __future__ import annotations

from ocr_service_ray.ops.pool import bcast_stage

from collections import Counter

import pyarrow as pa

from ocr_service_ray.ops.ngrams import _doc_grams


def _unique_gram_rows(ds, n: int, text_col: str, id_col: str, out_id: str):
    """Per-doc-distinct (out_id, gram_hash) rows — the combiner that
    keeps the join/broadcast input at one row per (doc, gram)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, grams = [], []
        for key, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for g in set(_doc_grams(t, n)):
                ids.append(key)
                grams.append(g)
        return pa.table(
            {
                out_id: pa.array(ids, batch[id_col].type),
                "gram_hash": pa.array(grams, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def contamination_pairs(
    train_ds,
    eval_ds,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "broadcast",
):
    """Dataset ``(train_id, eval_id, shared_grams)`` — one row per
    contaminated pair; ``shared_grams`` counts DISTINCT shared
    n-grams."""
    if strategy == "broadcast":
        return _pairs_broadcast(train_ds, eval_ds, n, text_col, id_col)
    if strategy == "shuffle":
        return _pairs_shuffle(train_ds, eval_ds, n, text_col, id_col)
    if strategy == "bloom":
        return _pairs_shuffle(train_ds, eval_ds, n, text_col, id_col, bloom=True)
    raise ValueError(f"unknown strategy: {strategy}")


def _pairs_broadcast(train_ds, eval_ds, n, text_col, id_col):
    import ray

    # eval grams → {gram: [eval ids]} — bounded by the benchmark set
    ev = _unique_gram_rows(eval_ds, n, text_col, id_col, "eval_id").to_pandas()
    gram_to_evals: dict[str, list] = {}
    if not ev.empty:  # Ray's to_pandas drops columns on zero-row datasets
        for g, e in zip(ev["gram_hash"], ev["eval_id"]):
            gram_to_evals.setdefault(g, []).append(e)
    # tier estimate for bcast_stage: the pulled frame's deep bytes
    # upper-bound the dict payload within a small constant
    ev_nbytes = 0 if ev.empty else int(ev.memory_usage(deep=True).sum())
    ev_ref = ray.put(gram_to_evals)

    class Probe:
        def __init__(self):
            self.evals = ray.get(ev_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            t_ids, e_ids, counts = [], [], []
            for key, t in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist()
            ):
                hits: Counter = Counter()
                for g in set(_doc_grams(t, n)):
                    for e in self.evals.get(g, ()):
                        hits[e] += 1
                for e, c in hits.items():
                    t_ids.append(key)
                    e_ids.append(e)
                    counts.append(c)
            return pa.table(
                {
                    "train_id": pa.array(t_ids, batch[id_col].type),
                    "eval_id": pa.array(e_ids, batch[id_col].type),
                    "shared_grams": pa.array(counts, pa.int64()),
                }
            )

    return bcast_stage(train_ds, Probe, ev_nbytes)


def _pairs_shuffle(train_ds, eval_ds, n, text_col, id_col, bloom=False):
    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.relational import hash_join

    tr = _unique_gram_rows(train_ds, n, text_col, id_col, "train_id")
    ev = _unique_gram_rows(eval_ds, n, text_col, id_col, "eval_id")
    if bloom:
        ev = ev.materialize()  # feeds both the filter build and the join
        tr = _bloom_prefilter(tr, ev)
    hits = hash_join(tr, ev, on="gram_hash")
    return grouped_agg(
        hits, ["train_id", "eval_id"], {"shared_grams": (None, "count")}
    )


_BLOOM_BITS = 1 << 23  # 1 MiB of bits; ~0.1% fp at ~1M eval grams, k=3
_BLOOM_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _bloom_positions(h: "np.ndarray") -> "np.ndarray":
    """(len(h), k) bit positions from the int64 gram hashes."""
    import numpy as np

    from ocr_service_ray.ops.hashing import _splitmix64

    hu = h.astype(np.int64).view(np.uint64)
    cols = [
        (_splitmix64(hu ^ np.uint64(seed)) % np.uint64(_BLOOM_BITS)).astype(np.int64)
        for seed in _BLOOM_SEEDS
    ]
    return np.stack(cols, axis=1)


def _bloom_prefilter(train_rows, eval_rows):
    """Filter (train_id, gram_hash) rows to grams the Bloom filter of
    the eval gram set MAYBE contains. Build is distributed (each block
    emits its packed bit array; the driver ORs ≤ |blocks| arrays of m/8
    bytes); the bits broadcast once via ray.put."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    nbytes = _BLOOM_BITS // 8

    def block_bits(b: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        if len(b):
            pos = _bloom_positions(
                b["gram_hash"].to_numpy(zero_copy_only=False)
            ).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = eval_rows.map_batches(block_bits, batch_format="pyarrow").to_pandas()
    bits = np.zeros(nbytes, dtype=np.uint8)
    for blob in parts.get("bits", ()):
        bits |= np.frombuffer(blob, dtype=np.uint8)
    bits_ref = ray.put(bits)

    class MaybeContains:
        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if len(b) == 0:
                return b
            pos = _bloom_positions(b["gram_hash"].to_numpy(zero_copy_only=False))
            hit = (self.bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
            return b.filter(pa.array(hit.all(axis=1)))

    return bcast_stage(train_rows, MaybeContains, bits.nbytes)


def decontaminate(
    train_ds,
    eval_ds,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Train corpus minus contaminated documents (any train doc
    sharing ≥ ``min_shared`` distinct n-grams with ANY eval doc).
    Drop set is broadcast — bounded by contaminated docs."""
    import pyarrow.compute as pc
    import ray

    pairs = contamination_pairs(
        train_ds, eval_ds, n, text_col, id_col, strategy="broadcast"
    ).to_pandas()
    if pairs.empty:
        return train_ds
    bad = pairs.loc[pairs["shared_grams"] >= min_shared, "train_id"].unique()
    bad_arr = pa.array(bad)
    bad_ref = ray.put(bad_arr)

    class DropContaminated:
        def __init__(self):
            self.bad = ray.get(bad_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(pc.is_in(b[id_col], value_set=self.bad)))

    return bcast_stage(train_ds, DropContaminated, bad_arr.nbytes)


def contamination_ratio(
    train_ds,
    eval_ds,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-train-document contamination FRACTION: of the document's
    distinct n-grams, how many appear anywhere in the eval set — the
    score thresholded by Llama/GPT-style decontamination policies
    (``contamination_pairs`` gives the per-pair breakdown; this gives
    the per-doc decision input). Documents with fewer than ``n`` words
    have no grams and are omitted (SQL GROUP BY semantics).

    ``ratio_micro`` is the exact integer
    ``(2_000_000 * n_shared + n_grams) // (2 * n_grams)`` — i.e.
    round-half-up of ``1e6 * n_shared / n_grams`` computed entirely in
    integers, so SQL reproduces it bit for bit with ``//``.

    100-TB shape: the eval gram set broadcasts once (``ray.put`` —
    bounded by the benchmark suite, the documented contract of the
    broadcast decontam strategy); the train side streams, one pass,
    zero shuffle. For a giant eval set, compose ``_unique_gram_rows``
    with the gram-keyed join of ``_pairs_shuffle`` and derive the
    counts from that instead.

    Output: ``{id_col, n_grams, n_shared, ratio_micro}``.
    """
    import ray

    ev = _unique_gram_rows(eval_ds, n, text_col, id_col, "eval_id").to_pandas()
    gram_set = frozenset(ev["gram_hash"]) if not ev.empty else frozenset()
    # measured serialized size (what ray.put ships) — a fixed per-slot
    # guess undercounts string-heavy containers and mis-tiers them
    from ocr_service_ray.ops.pool import measured_nbytes

    ev_nbytes = measured_nbytes(gram_set)
    ev_ref = ray.put(gram_set)

    class Score:
        def __init__(self):
            self.grams = ray.get(ev_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, ngs, nss, rms = [], [], [], []
            for key, t in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist()
            ):
                gs = set(_doc_grams(t, n))
                if not gs:
                    continue
                c = sum(1 for g in gs if g in self.grams)
                m = len(gs)
                ids.append(key)
                ngs.append(m)
                nss.append(c)
                rms.append((2_000_000 * c + m) // (2 * m))
            return pa.table(
                {
                    id_col: pa.array(ids, batch[id_col].type),
                    "n_grams": pa.array(ngs, pa.int64()),
                    "n_shared": pa.array(nss, pa.int64()),
                    "ratio_micro": pa.array(rms, pa.int64()),
                }
            )

    return bcast_stage(train_ds, Score, ev_nbytes)
