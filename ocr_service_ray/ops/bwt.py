"""Burrows-Wheeler transform run structure — the BWT (Burrows &
Wheeler 1994) permutes a string by sorting its rotations and taking
last characters; equal-context characters cluster, so the run count
of the BWT vs the raw string is a sharp, model-free compressibility
/ repetitiveness signal (the core of bzip2 and FM-indexes).

Determinism contract (the oracle replays it): rotations of the
``cap``-char prefix (NO sentinel) sorted by (rotation string, start
index) — UTF-8 bytewise string order, identical in Python and
DuckDB; bwt[j] = last char of the j-th sorted rotation;
runs(x) = 1 + #{j : x[j] != x[j-1]} (0 for the empty string);
gain_ppm = 10^6 * bwt_runs // raw_runs (0 when n = 0).

100-TB shape: capped per-doc work, one shuffle-free map_batches
pass (ops/lz / ops/substrings discipline). Engine sorts n
rotations in O(n^2 log n) on the 24-char cap; the oracle
enumerates rotations with generate_series — same contract, no
shared code."""

from __future__ import annotations

import pyarrow as pa


def _runs(x: str) -> int:
    if not x:
        return 0
    return 1 + sum(1 for a, b in zip(x, x[1:]) if a != b)


def bwt_last_column(s: str) -> str:
    """BWT without sentinel: last chars of rotations sorted by
    (rotation, start)."""
    n = len(s)
    rots = sorted((s[i:] + s[:i], i) for i in range(n))
    return "".join(s[i - 1] for _, i in rots)


def bwt_runs(ds, id_col: str, text_col: str, cap: int = 24):
    """Dataset of ``(id, prefix_len, bwt_runs, raw_runs, gain_ppm)``
    over the first ``cap`` chars of each document."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ln, br, rr, gp = [], [], [], []
        for t in texts:
            s = (t or "")[:cap]
            bw = bwt_last_column(s)
            b_ = _runs(bw)
            r_ = _runs(s)
            ln.append(len(s))
            br.append(b_)
            rr.append(r_)
            gp.append(1_000_000 * b_ // r_ if r_ else 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ln, pa.int64()),
                "bwt_runs": pa.array(br, pa.int64()),
                "raw_runs": pa.array(rr, pa.int64()),
                "gain_ppm": pa.array(gp, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
