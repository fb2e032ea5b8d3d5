"""Winnowing fingerprint selection — Schleimer, Wilkerson & Aiken
2003 (the MOSS algorithm): hash every k-gram, slide a window of w
hashes, keep each window's minimum. Guarantees: any match of length
>= w + k - 1 between two documents shares at least one selected
fingerprint, while storing only ~2/(w+1) of the hashes — the
bandwidth-bounded near-dup/plagiarism sketch between exact hashing
and MinHash.

Determinism contract (oracle-replayed, repo md5 discipline):
  gram_i   = s[i : i+k]   (character k-grams of the capped prefix)
  h_i      = md5(gram_i) hex[0:15] as int  (60-bit)
  window j (j = 0..n_grams-w) selects argmin_{i in [j, j+w)} (h_i, i)
  fingerprints = DISTINCT selected positions
Reported per doc: n_grams, n_selected, density_ppm =
10^6 * n_selected // n_windows (0 when no windows), min_fp = the
smallest selected hash (0 when none).

100-TB shape: capped per-doc work, one shuffle-free map_batches
pass; the selected-fingerprint table (not built here) is the
gram-keyed shuffle input of the dedup family."""

from __future__ import annotations

import hashlib

import pyarrow as pa


def winnow_select(s: str, k: int = 5, w: int = 4) -> tuple[int, list[int], list[int]]:
    """(n_grams, selected positions, their hashes) for one string."""
    grams = [s[i : i + k] for i in range(max(len(s) - k + 1, 0))]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    ]
    n = len(hs)
    sel: dict[int, int] = {}
    for j in range(max(n - w + 1, 0)):
        best = min(range(j, j + w), key=lambda i: (hs[i], i))
        sel[best] = hs[best]
    pos = sorted(sel)
    return n, pos, [sel[p] for p in pos]


def winnow_docs(ds, id_col: str, text_col: str, cap: int = 48, k: int = 5, w: int = 4):
    """Dataset of ``(id, n_grams, n_selected, density_ppm, min_fp)``."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ng, ns, dp, mf = [], [], [], []
        for t in texts:
            s = (t or "")[:cap]
            n, pos, hsh = winnow_select(s, k, w)
            nw = max(n - w + 1, 0)
            ng.append(n)
            ns.append(len(pos))
            dp.append(1_000_000 * len(pos) // nw if nw else 0)
            mf.append(min(hsh) if hsh else 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_grams": pa.array(ng, pa.int64()),
                "n_selected": pa.array(ns, pa.int64()),
                "density_ppm": pa.array(dp, pa.int64()),
                "min_fp": pa.array(mf, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
