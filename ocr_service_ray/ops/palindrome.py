"""Longest palindromic substring — Manacher's algorithm (Manacher
1975): linear time via mirrored-radius reuse over the separator-
transformed string, vs the oracle's quadratic probe of every
(start, length) against its reverse. Palindromic runs flag
mirrored/garbled OCR artifacts and synthetic boilerplate.

Determinism contract: longest palindrome of the ``cap``-char
prefix; ties break to the SMALLEST start. ``pal_start`` is 1-based
(SQL substring convention); (0, 0, '') for the empty prefix.

100-TB shape: capped per-doc work, one shuffle-free map_batches
pass. Engine O(n), oracle O(n^3)-ish brute — independent
algorithms, one answer."""

from __future__ import annotations

import pyarrow as pa


def manacher_longest(s: str) -> tuple[int, int]:
    """(length, start0) of the longest palindromic substring; ties
    to smallest start; (0, 0) for empty."""
    if not s:
        return 0, 0
    # transformed string with separators: len 2n+1
    t = "\x00" + "\x00".join(s) + "\x00"
    n = len(t)
    p = [0] * n
    c = r = 0
    for i in range(n):
        if i < r:
            m = 2 * c - i
            p[i] = min(r - i, p[m])
        while i - p[i] - 1 >= 0 and i + p[i] + 1 < n and t[i - p[i] - 1] == t[i + p[i] + 1]:
            p[i] += 1
        if i + p[i] > r:
            c, r = i, i + p[i]
    best_len, best_start = 0, 0
    for i in range(n):
        if p[i] > best_len:
            best_len = p[i]
            best_start = (i - p[i]) // 2
    return best_len, best_start


def longest_palindromes(ds, id_col: str, text_col: str, cap: int = 32):
    """Dataset of ``(id, prefix_len, pal_len, pal_start, pal)`` —
    pal_start is 1-based, 0 when the prefix is empty."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ln, pl, ps, pv = [], [], [], []
        for txt in texts:
            s = (txt or "")[:cap]
            length, start0 = manacher_longest(s)
            ln.append(len(s))
            pl.append(length)
            ps.append(start0 + 1 if length else 0)
            pv.append(s[start0 : start0 + length])
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ln, pa.int64()),
                "pal_len": pa.array(pl, pa.int64()),
                "pal_start": pa.array(ps, pa.int64()),
                "pal": pa.array(pv, pa.string()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
