"""Needleman-Wunsch global token alignment — exact integer edit cost
between token sequences (Needleman & Wunsch 1970; with unit gap and
mismatch costs this is token-level Levenshtein, the alignment
backbone of OCR-vs-golden and near-dup drift audits).

Per-document DP over CAPPED token windows (cap is part of the
contract — alignment is O(n·m) per doc, so the cap is what makes the
op streamable: every document costs the same bounded work inside
map_batches, embarrassingly parallel, no shuffle at all).
dp(i,0)=i, dp(0,j)=j, dp(i,j) = min(dp(i-1,j-1)+[a_i≠b_j],
dp(i-1,j)+1, dp(i,j-1)+1) — all integers; the oracle replays the DP
cell by cell (the dtw list-carrying recursive-CTE discipline, real
boundary values instead of ∞).

Reference anchor: the reference validates OCR output per document
(core/validators.py) but has no sequence-alignment audit; this is
part of the beyond-reference curation family (SURVEY §2.11)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def token_levenshtein(a: list, b: list) -> int:
    """Exact unit-cost alignment distance between two token lists."""
    n, m = len(a), len(b)
    prev = np.arange(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        ai = a[i - 1]
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j - 1] + (0 if ai == b[j - 1] else 1),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return int(prev[m])


def align_vs_edited(
    ds,
    id_col: str,
    text_col: str,
    cap: int = 16,
    sub_mod: int = 7,
    sub_at: int = 3,
    del_mod: int = 11,
    del_at: int = 5,
):
    """Per-doc alignment cost between the first ``cap`` whitespace
    tokens and a deterministically edited variant of the same window
    (token i substituted with '<sub>' when i % sub_mod == sub_at,
    dropped when i % del_mod == del_at, 0-based — the synthetic
    drift model). One map_batches pass; returns a Dataset of
    ``(id_col, n_a, n_b, align_cost)``."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_n_a, out_n_b, out_c = [], [], []
        for t in texts:
            toks = (t or "").split(" ")[:cap]
            edited = [
                ("<sub>" if i % sub_mod == sub_at else x)
                for i, x in enumerate(toks)
                if i % del_mod != del_at
            ]
            out_n_a.append(len(toks))
            out_n_b.append(len(edited))
            out_c.append(token_levenshtein(toks, edited))
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_a": pa.array(out_n_a, pa.int64()),
                "n_b": pa.array(out_n_b, pa.int64()),
                "align_cost": pa.array(out_c, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
