"""LZW dictionary parse — Welch 1984: greedy longest-match
factorization against a GROWING dictionary (seeded with the
prefix's distinct characters, sorted), emitting one code per factor
and learning matched+next each step. The dictionary-based
compressibility signal, complementary to ops/lz.py's LZ76
(self-referential factors) and ops/bwt.py (context clustering):
three different compressors, three repetitiveness lenses.

Determinism contract (oracle replays the parse step by step with a
dict-carrying recursive CTE):
  dict_0   = sorted distinct chars of the capped prefix
  step     = longest dict entry matching at pos (unique — entries
             are distinct), emit its index, append matched+next
             char when one exists
  outputs  = (prefix_len, n_codes, dict_size, ratio_ppm =
              10^6 * n_codes // prefix_len; 0 for empty)

100-TB shape: capped per-doc work, one shuffle-free map_batches
pass."""

from __future__ import annotations

import pyarrow as pa


def lzw_parse(s: str) -> tuple[int, int]:
    """(n_codes, final dict size) of the LZW parse of ``s``."""
    if not s:
        return 0, 0
    d = sorted(set(s))
    dset = {e: i for i, e in enumerate(d)}
    pos = 0
    n_codes = 0
    n = len(s)
    while pos < n:
        # greedy longest match (dictionary entries are distinct)
        best = 1
        probe = min(n - pos, max(len(e) for e in dset))
        for L in range(probe, 0, -1):
            if s[pos : pos + L] in dset:
                best = L
                break
        n_codes += 1
        if pos + best < n:
            new = s[pos : pos + best + 1]
            if new not in dset:
                dset[new] = len(dset)
        pos += best
    return n_codes, len(dset)


def lzw_docs(ds, id_col: str, text_col: str, cap: int = 24):
    """Dataset of ``(id, prefix_len, n_codes, dict_size,
    ratio_ppm)``."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ln, nc, dsz, rp = [], [], [], []
        for t in texts:
            s = (t or "")[:cap]
            c, z = lzw_parse(s)
            ln.append(len(s))
            nc.append(c)
            dsz.append(z)
            rp.append(1_000_000 * c // len(s) if s else 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ln, pa.int64()),
                "n_codes": pa.array(nc, pa.int64()),
                "dict_size": pa.array(dsz, pa.int64()),
                "ratio_ppm": pa.array(rp, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
