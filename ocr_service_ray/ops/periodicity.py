"""String periodicity — KMP failure-function border analysis per
document (Knuth, Morris & Pratt 1977; the border array gives the
smallest period p = n − border(n) in LINEAR time, vs the quadratic
probe the oracle uses — near-periodic prefixes flag looping
boilerplate and OCR stutter at a finer grain than n-gram rules).

Fine print the oracle replays: period = smallest p ≥ 1 with
s[p:] == s[:n−p] (the classic border identity; p = n means no
repetition at all), exponent_micro = 10⁶·n // p (≥ 2·10⁶ iff the
prefix is at least a square). Capped prefixes as in ops/lz —
bounded per-doc work, one shuffle-free map_batches pass."""

from __future__ import annotations

import pyarrow as pa


def failure_border(s: str) -> int:
    """Length of the longest proper border of ``s`` (KMP pi[n])."""
    n = len(s)
    pi = [0] * (n + 1)
    k = 0
    for i in range(1, n):
        while k and s[i] != s[k]:
            k = pi[k]
        if s[i] == s[k]:
            k += 1
        pi[i + 1] = k
    return pi[n]


def periodicity(ds, id_col: str, text_col: str, cap: int = 48):
    """Dataset of ``(id_col, prefix_len, border, period,
    exponent_micro)`` over the first ``cap`` chars."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ln, bd, pd_, ex = [], [], [], []
        for t in texts:
            p = (t or "")[:cap]
            n = len(p)
            border = failure_border(p) if n else 0
            period = n - border if n else 0
            ln.append(n)
            bd.append(border)
            pd_.append(period)
            ex.append((n * 1_000_000) // period if period else 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ln, pa.int64()),
                "border": pa.array(bd, pa.int64()),
                "period": pa.array(pd_, pa.int64()),
                "exponent_micro": pa.array(ex, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
