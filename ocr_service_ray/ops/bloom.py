"""Bloom-filter semi-join pruning.

The scale pattern for filtering a huge fact table by membership in a
large-but-not-tiny dimension key set (ref analogue: the corrections /
active-learning skip-existing lookups, ``services/active_learning.py:110``,
generalized to key sets too big to ship comfortably). Broadcasting the
exact key set costs O(|keys| * 8 B) in every executor's probe hash
set; a Bloom bitmap costs O(num_bits / 8) REGARDLESS of key count,
and the exact verify then runs only on bloom survivors — at a typical
5–10% dimension selectivity, ~90% of fact rows are rejected by a few
vectorized uint64 ops without ever touching the exact set.

Exactness: false positives never reach the output — stage 2 re-checks
every bloom survivor against the exact key set (``pc.is_in``), so the
result equals a plain semi-join bit for bit and the SQL oracle needs
no bloom arithmetic. A Bloom filter has no false negatives by
construction, so no qualifying row is lost.

At 100 TB: build the bitmap with the combiner below (per-block
partial bitmaps OR-merged — the driver sees |blocks| fixed-size
byte strings, never keys), ``ray.put`` the ~128 KiB–16 MiB bitmap
once, and keep the exact set OUT of the broadcast when it is truly
huge — replace stage 2 with a key-partitioned hash join over the
(much smaller) survivor stream; the bloom stage is unchanged and
still removes the bulk of the traffic before the shuffle.
"""

from __future__ import annotations

from ocr_service_ray.ops.pool import bcast_stage, measured_nbytes

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_service_ray.ops.hashing import _splitmix64, hash_column

__all__ = ["build_bloom", "bloom_membership", "BloomSemiJoin", "bloom_semi_join"]


def _h2(h1: np.ndarray) -> np.ndarray:
    """Second hash for Kirsch–Mitzenmacher double hashing, forced odd
    so successive probe indices never degenerate to a single bit."""
    return _splitmix64(h1 ^ np.uint64(0xA5A5A5A55A5A5A5A)) | np.uint64(1)


def build_bloom(ds, col: str, num_bits: int = 1 << 20, num_hashes: int = 4) -> np.ndarray:
    """Bitmap (uint64 words) over the values of ``ds[col]``.

    Combiner discipline: each block folds its keys into a private
    bitmap; the driver OR-merges |blocks| equal-size byte strings.
    Keys never leave their block.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        w = np.zeros(n_words, dtype=np.uint64)
        h1 = hash_column(b[col])
        h2 = _h2(h1)
        for i in range(num_hashes):
            with np.errstate(over="ignore"):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(
                w, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return pa.table({"words": pa.array([w.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(n_words, dtype=np.uint64)
    for row in parts:
        merged |= np.frombuffer(row["words"], dtype=np.uint64)
    return merged


def bloom_membership(arr, bloom: np.ndarray, num_hashes: int = 4) -> np.ndarray:
    """Vectorized membership probe: bool mask, True = possibly in the
    set (false positives possible, false negatives impossible)."""
    num_bits = np.uint64(len(bloom) * 64)
    h1 = hash_column(arr)
    h2 = _h2(h1)
    member = np.ones(len(h1), dtype=bool)
    for i in range(num_hashes):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) % num_bits
        bits = bloom[(idx >> np.uint64(6)).astype(np.int64)]
        member &= (bits >> (idx & np.uint64(63))) & np.uint64(1) > 0
    return member


class BloomSemiJoin:
    """Actor-pool stage: bloom pre-filter then exact verify.

    ``__init__`` pulls the bitmap and exact key set from the object
    store ONCE per actor; ``__call__`` is two vectorized passes. The
    returned ``n_bloom_pass``/``n_exact`` counters (exposed via
    ``stats_table``) let tests assert the bloom actually pruned.
    """

    def __init__(self, bloom_ref, keys_ref, col: str, num_hashes: int = 4):
        import ray

        self.bloom = ray.get(bloom_ref)
        self.keys = pa.array(ray.get(keys_ref))
        self.col = col
        self.num_hashes = num_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        member = bloom_membership(batch[self.col], self.bloom, self.num_hashes)
        surv = batch.filter(pa.array(member))
        col = surv[self.col]
        if len(self.keys) and not col.type.equals(self.keys.type):
            col = pc.cast(col, self.keys.type)
        exact = pc.fill_null(pc.is_in(col, value_set=self.keys), False)
        return surv.filter(exact)


def bloom_semi_join(ds, keys, on: str, num_bits: int = 1 << 20, num_hashes: int = 4):
    """Semi-join ``ds`` to ``keys`` on column ``on`` with a bloom
    pre-filter. ``keys`` is a Python sequence / numpy array of key
    values (dimension-sized by contract — see module docstring for
    the huge-key-set variant)."""
    import ray

    keys = list(keys)
    bloom = np.zeros(num_bits // 64, dtype=np.uint64)
    h1 = hash_column(pa.array(keys))
    h2 = _h2(h1)
    for i in range(num_hashes):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        np.bitwise_or.at(
            bloom, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    bloom_ref = ray.put(bloom)
    keys_ref = ray.put(keys)
    return bcast_stage(
        ds,
        BloomSemiJoin,
        # bitmap + measured key bytes (keys can be wide strings); None
        # from an unpicklable key container pins the actor tier
        (lambda kb: None if kb is None else bloom.nbytes + kb)(
            measured_nbytes(keys)
        ),
        fn_constructor_kwargs={
            "bloom_ref": bloom_ref,
            "keys_ref": keys_ref,
            "col": on,
            "num_hashes": num_hashes,
        },
    )
