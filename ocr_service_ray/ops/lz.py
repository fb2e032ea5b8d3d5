"""LZ76 factorization complexity — per-document compressibility
scoring by greedy left-to-right parsing (Lempel & Ziv 1976; the
phrase count normalizes to entropy and is the classic text-
complexity / randomness proxy — low phrase counts flag template
spam and stutter, complementary to ops/substrings' density).

Greedy rule (deterministic, replayed verbatim by the oracle): at
position p, the next factor is the LONGEST prefix of the remaining
text that occurs in the already-parsed text s[0:p) (non-self-
referential variant — the match must lie ENTIRELY within the parsed
prefix, located with plain substring search); if even one character
is novel, the factor is a literal of length 1. Factor count and
literal count are the outputs.

Per-doc work is bounded by the prefix cap (the align/substrings
contract), one shuffle-free map_batches pass."""

from __future__ import annotations

import pyarrow as pa


def lz76_factors(s: str) -> tuple[int, int]:
    """(n_factors, n_literals) of the greedy parse of ``s``."""
    n = len(s)
    p = 0
    nf = nl = 0
    while p < n:
        best = 0
        l = 1
        while p + l <= n and s.find(s[p : p + l], 0, p) != -1:
            best = l
            l += 1
        if best == 0:
            nl += 1
            p += 1
        else:
            p += best
        nf += 1
    return nf, nl


def lz_complexity(ds, id_col: str, text_col: str, cap: int = 48):
    """Dataset of ``(id_col, prefix_len, n_factors, n_literals,
    complexity_ppm)`` over the first ``cap`` chars; complexity_ppm =
    n_factors · 10⁶ // prefix_len (1.0 = incompressible stream of
    novel chars)."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ls, fs, lits, cx = [], [], [], []
        for t in texts:
            pfx = (t or "")[:cap]
            nf, nl = lz76_factors(pfx)
            n = len(pfx)
            ls.append(n)
            fs.append(nf)
            lits.append(nl)
            cx.append((nf * 1_000_000) // n if n else 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ls, pa.int64()),
                "n_factors": pa.array(fs, pa.int64()),
                "n_literals": pa.array(lits, pa.int64()),
                "complexity_ppm": pa.array(cx, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
