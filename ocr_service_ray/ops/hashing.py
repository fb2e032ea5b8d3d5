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


# --------------------------------------------------------------------
# Fast vectorized token / n-gram hashing — the production (`hash=
# "fast"`) mode of the dedup family (ops/dedup.py, ops/ngrams.py).
# The oracle mode hashes every gram with hashlib.md5 in a Python loop
# so DuckDB can recompute signatures from scratch; production corpora
# don't need SQL-reproducibility, and per-gram md5 was the dominant
# cost of the three slowest bench queries. Here the whole document is
# hashed in O(bytes) numpy: one UTF-8 encode, a positional polynomial
# prefix-sum, and segment differences — no per-token Python.
#
# Element-purity: a token's hash is a pure function of its bytes
# (position weights are normalized away via the modular inverse of
# the odd base, which exists mod 2^64), so the same token hashes
# identically in every document, batch and process — the property the
# banding/bucketing shuffles rely on.

_POLY_B = np.uint64(0x100000001B3)  # odd → invertible mod 2^64
_POLY_B_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_GRAM_C = np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)  # odd mixing base


def hash_tokens_fast(toks: list[str]) -> np.ndarray:
    """uint64 hash per token, vectorized over the whole list.

    h(token) = splitmix64( Σ_i byte_i · B^i  ⊕  splitmix64(len) )
    computed for ALL tokens at once: the tokens are NUL-joined and
    encoded ONCE; per-position weights B^p and the weighted prefix sum
    are cumulative numpy ops; each token's windowed sum is two prefix
    lookups re-based by B^{-start}. Falls back to the per-token
    blake2b loop iff a token itself contains NUL (would shift the
    segment boundaries)."""
    if not toks:
        return np.empty(0, dtype=np.uint64)
    buf = "\x00".join(toks).encode("utf-8")
    a = np.frombuffer(buf, dtype=np.uint8)
    seps = np.nonzero(a == 0)[0]
    if len(seps) != len(toks) - 1:  # NUL inside a token — rare; exact fallback
        return np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
    n = len(a)
    starts = np.concatenate([[0], seps + 1]).astype(np.int64)
    ends = np.concatenate([seps, [n]]).astype(np.int64)  # exclusive
    with np.errstate(over="ignore"):
        bpow = np.ones(n + 1, dtype=np.uint64)
        if n:
            np.cumprod(np.full(n, _POLY_B, dtype=np.uint64), out=bpow[1:])
        binv_pow = np.ones(n + 1, dtype=np.uint64)
        if n:
            np.cumprod(np.full(n, _POLY_B_INV, dtype=np.uint64), out=binv_pow[1:])
        csum = np.concatenate(
            [[np.uint64(0)], np.cumsum(a.astype(np.uint64) * bpow[:n], dtype=np.uint64)]
        )
        seg = (csum[ends] - csum[starts]) * binv_pow[starts]  # re-base to B^0
        lens = (ends - starts).astype(np.uint64)
        return _splitmix64(seg ^ _splitmix64(lens))


def gram_hashes_fast(token_hashes: np.ndarray, n: int) -> np.ndarray:
    """uint64 hash per token n-gram from per-token hashes: a sliding
    window polynomial fold (Σ_j th[i+j] · C^j), splitmix64-finalized.
    Returns len(th) - n + 1 hashes (empty when fewer than n tokens)."""
    if len(token_hashes) < n:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        w = np.empty(n, dtype=np.uint64)
        w[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _GRAM_C, dtype=np.uint64), out=w[1:])
        win = np.lib.stride_tricks.sliding_window_view(token_hashes, n)
        return _splitmix64((win * w[None, :]).sum(axis=1, dtype=np.uint64))
