"""Smith-Waterman local alignment — Smith & Waterman 1981: the
LOCAL complement to ops/align.py's global Needleman-Wunsch. The DP
floors at zero, so the score finds the best matching SUBSTRING pair
regardless of surrounding noise — the fuzzy-probe primitive
(find-a-garbled-phrase-inside-OCR-text).

Integer contract (oracle replays the DP cell by cell):
  match +2, mismatch -1, gap -1, floor 0;
  H(i,j) = max(0, H(i-1,j-1) + s(a_i, b_j), H(i-1,j) - 1,
               H(i,j-1) - 1)
  sw_score = max cell; (end_i, end_j) = 1-based indices of the max
  cell, ties to the smallest (i, j); (0, 0) when the score is 0.

Capped per-doc work -> one shuffle-free map_batches pass."""

from __future__ import annotations

import pyarrow as pa


def sw_local(a: str, b: str) -> tuple[int, int, int]:
    """(score, end_i, end_j) of the best local alignment."""
    n, m = len(a), len(b)
    prev = [0] * (m + 1)
    best, bi, bj = 0, 0, 0
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        ai = a[i - 1]
        for j in range(1, m + 1):
            h = max(
                0,
                prev[j - 1] + (2 if ai == b[j - 1] else -1),
                prev[j] - 1,
                cur[j - 1] - 1,
            )
            cur[j] = h
            if h > best:
                best, bi, bj = h, i, j
        prev = cur
    return best, bi, bj


def sw_probe_docs(ds, id_col: str, text_col: str, probe: str, cap: int = 16):
    """Dataset of ``(id, prefix_len, sw_score, end_i, end_j)`` for
    the capped prefix vs the fixed probe."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ln, sc, ei, ej = [], [], [], []
        for t in texts:
            s = (t or "")[:cap]
            score, i, j = sw_local(s, probe)
            ln.append(len(s))
            sc.append(score)
            ei.append(i)
            ej.append(j)
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ln, pa.int64()),
                "sw_score": pa.array(sc, pa.int64()),
                "end_i": pa.array(ei, pa.int64()),
                "end_j": pa.array(ej, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
