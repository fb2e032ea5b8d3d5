"""Bernoulli Naive Bayes with EXACT integer inference — the classic
generative text classifier (Maron 1961; McCallum & Nigam 1998 for
the Bernoulli event model), trained and applied with zero floats:
posterior comparisons are cross-multiplied big-integer fractions, so
argmax and ties are bit-reproducible and the SQL oracle can replay
inference with HUGEINT arithmetic.

Model (k binary substring-presence features, Laplace +1/+2):
  prior_c ∝ n_c
  P(f_j=1|c) = (cnt_jc + 1) / (n_c + 2)
  S_c(fv)    = n_c * Π_j num_jc(fv_j) / (n_c + 2)^k
  pred(fv)   = argmax_c S_c, ties -> smallest class label
With k features there are only 2^k distinct feature vectors, so
inference collapses to a 2^k-entry lookup table computed ONCE with
exact Fractions — per-document classification is a vectorized
table lookup, not per-row arithmetic.

100-TB shape: training is one scan folding to a |classes|-row count
combiner; classification is a second scan against the broadcast
2^k LUT; the confusion matrix is a bounded grouped count. (Two
passes over the source — the grouped_outliers discipline; at scale
point both at a persisted projection.)"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def nb_train_stats(ds, label_col: str, text_col: str, features: list[str]) -> pd.DataFrame:
    """One-scan per-class counts: (label, n, c0..ck-1) where cj =
    docs of the class containing substring features[j]."""
    from ocr_service_ray.ops.agg import grouped_agg

    k = len(features)

    def partial(b: pa.Table) -> pa.Table:
        cols = {label_col: b[label_col], "n": pa.array(np.ones(len(b), np.int64))}
        for j, w in enumerate(features):
            m = pc.match_substring(b[text_col], w)
            cols[f"c{j}"] = pc.cast(m, pa.int64())
        return pa.table(cols)

    spec = {"n": ("n", "sum")}
    for j in range(k):
        spec[f"c{j}"] = (f"c{j}", "sum")
    return (
        grouped_agg(ds.map_batches(partial, batch_format="pyarrow"), [label_col], spec)
        .to_pandas()
        .sort_values(label_col)
        .reset_index(drop=True)
    )


def nb_lut(stats: pd.DataFrame, label_col: str, k: int) -> list[str]:
    """Exact-argmax prediction for each of the 2^k feature vectors
    (bit j of the index = feature j present)."""
    classes = list(stats[label_col])
    n = {c: int(v) for c, v in zip(classes, stats["n"])}
    cnt = {
        c: [int(stats.loc[i, f"c{j}"]) for j in range(k)]
        for i, c in zip(stats.index, classes)
    }
    lut = []
    for fv in range(1 << k):
        best, best_s = None, None
        for c in sorted(classes):
            num = n[c]
            for j in range(k):
                if fv >> j & 1:
                    num *= cnt[c][j] + 1
                else:
                    num *= n[c] + 1 - cnt[c][j]
            s = Fraction(num, (n[c] + 2) ** k)
            if best_s is None or s > best_s:
                best, best_s = c, s
        lut.append(best)
    return lut


def nb_confusion(ds, label_col: str, text_col: str, features: list[str]) -> pd.DataFrame:
    """Train on the labelled Dataset, classify every row, return the
    confusion matrix ``(label, pred_<label>, n_docs)``."""
    from ocr_service_ray.ops.agg import grouped_agg

    k = len(features)
    stats = nb_train_stats(ds, label_col, text_col, features)
    lut = np.array(nb_lut(stats, label_col, k))

    def classify(b: pa.Table, lut=lut) -> pa.Table:
        fv = np.zeros(len(b), np.int64)
        for j, w in enumerate(features):
            fv |= pc.match_substring(b[text_col], w).to_numpy(
                zero_copy_only=False
            ).astype(np.int64) << j
        return pa.table(
            {
                label_col: b[label_col],
                "pred_" + label_col: pa.array(lut[fv]),
                "one": pa.array(np.ones(len(b), np.int64)),
            }
        )

    out = (
        grouped_agg(
            ds.map_batches(classify, batch_format="pyarrow"),
            [label_col, "pred_" + label_col],
            {"n_docs": ("one", "sum")},
        )
        .to_pandas()
        .sort_values([label_col, "pred_" + label_col])
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return out
