"""Vocabulary diversity + richness estimators, exact rationals:

- Simpson's unbiased diversity (Simpson 1949, without-replacement
  form): D = 1 - sum n_i(n_i-1) / (N(N-1)) — the probability two
  tokens drawn without replacement differ. The finite-sample
  correction makes it genuinely different from the HHI p^2 form the
  repo already has (type_user_hhi); reported as (d_num, d_den).

- Chao1 richness (Chao 1984, bias-corrected): how many types does
  the vocabulary REALLY have, given singletons f1 and doubletons
  f2: chao1 = S_obs + f1(f1-1) / (2(f2+1)) — reported milli-scaled
  plus the raw (f1, f2). The unseen-species companion to
  Good-Turing's unseen-MASS row (L420).

100-TB shape: token counts per group are one combiner aggregate;
count-of-counts folds to bounded rows; all arithmetic integer."""

from __future__ import annotations

import pandas as pd


def diversity_report(token_counts: pd.DataFrame, group_col: str, count_col: str) -> pd.DataFrame:
    """Per-group Simpson + Chao1 from a (group, token_count) table
    (one row per distinct token). Returns (group, n_tokens,
    s_obs, f1, f2, d_num, d_den, chao1_milli) sorted by group."""
    rows = []
    for g, grp in token_counts.groupby(group_col):
        cnts = [int(x) for x in grp[count_col]]
        N = sum(cnts)
        s_obs = len(cnts)
        f1 = sum(1 for c in cnts if c == 1)
        f2 = sum(1 for c in cnts if c == 2)
        d_num = N * (N - 1) - sum(c * (c - 1) for c in cnts)
        d_den = N * (N - 1) if N > 1 else 1
        chao1_milli = 1000 * s_obs + 1000 * f1 * (f1 - 1) // (2 * (f2 + 1))
        rows.append((g, N, s_obs, f1, f2, d_num, d_den, chao1_milli))
    out = pd.DataFrame(
        rows,
        columns=[
            group_col, "n_tokens", "s_obs", "f1", "f2",
            "d_num", "d_den", "chao1_milli",
        ],
    ).sort_values(group_col).reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out
