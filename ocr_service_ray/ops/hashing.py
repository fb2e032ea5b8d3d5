"""Element-pure stable hashing for shuffle keys.

``pandas.util.hash_array`` is NOT element-pure: the hash of an element
can depend on the other elements in the array (observed: the same
string hashing to different values in different batches — which
silently broke a hash-bucketed dedup by sending copies of the same
pair to different buckets). Shuffle keys need a hash that is a pure
function of the element value, identical in every process and batch.

- integers: vectorized splitmix64 finalizer (numpy, exact uint64).
- strings/other: per-element blake2b (Python loop, ~1 µs/row — these
  hashes run over candidate/pair tables, not the corpus hot path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


# Nulls hash to a fixed reserved value so a null shuffle key buckets
# deterministically instead of crashing mid-shuffle (None has no
# .encode; float-NaN view is dtype-unstable). Any constant works —
# a collision with a real key only co-buckets them, never merges them.
_NULL_SENTINEL_INT = np.int64(-0x6A09E667F3BCC909)  # reserved, hashed like any value
_NULL_HASH = np.uint64(
    int.from_bytes(hashlib.blake2b(b"\x00__null__", digest_size=8).digest(), "little")
)


def hash_column(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 hash per element — pure function of the value.
    Null elements hash to a fixed sentinel (element-purity includes
    nulls: same bucket in every batch/process)."""
    if pa.types.is_integer(arr.type):
        filled = pc.fill_null(pc.cast(arr, pa.int64()), _NULL_SENTINEL_INT)
        return _splitmix64(
            filled.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        )
    vals = pc.cast(arr, pa.string()).to_pylist()
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "little")
            if v is not None
            else _NULL_HASH
            for v in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )


def hash_pair_columns(a: pa.ChunkedArray | pa.Array, b: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 hash of an (a, b) key pair (order-sensitive)."""
    with np.errstate(over="ignore"):
        return _splitmix64(
            hash_column(a) * np.uint64(0x100000001B3) ^ hash_column(b)
        )
