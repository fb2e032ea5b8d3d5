"""MOSS candidate-pair detection — the full Schleimer-Wilkerson-Aiken
pipeline on top of ops/winnow.py: winnow each document to its
selected fingerprints, bucket documents by fingerprint (the
gram-keyed shuffle of the dedup family), emit candidate pairs, and
VERIFY each pair with the exact longest-common-substring of the two
capped prefixes. The winnowing guarantee makes the blocker lossless
for matches of length >= w + k - 1, and the verify step kills hash
coincidences — sketch-block-verify, the repo's dedup discipline.

Contract (oracle-replayed end to end):
  per doc: winnow_select(cap=48, k=5, w=4) fingerprint HASHES
  pairs   : docs sharing any selected hash, id_a < id_b
  verify  : lcs_len = exact longest common substring of the two
            prefixes; keep pairs with lcs_len >= w + k - 1 = 8
  output  : (id_a, id_b, n_shared_fp, lcs_len) sorted.

100-TB shape: fingerprints ride a (hash -> docs) combiner shuffle —
ONLY selected hashes move (~2/(w+1) of grams); buckets are
hot-key-bounded by the same discipline as minhash banding; verify
touches candidate pairs only."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def lcs_length(a: str, b: str) -> int:
    """Exact longest common substring length (DP, capped inputs)."""
    if not a or not b:
        return 0
    n, m = len(a), len(b)
    prev = [0] * (m + 1)
    best = 0
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        ai = a[i - 1]
        for j in range(1, m + 1):
            if ai == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def moss_pairs(
    ds, id_col: str, text_col: str, cap: int = 48, k: int = 5, w: int = 4
) -> pd.DataFrame:
    """Winnow-blocked, LCS-verified near-match pairs."""
    from ocr_service_ray.ops.winnow import winnow_select

    def fingerprints(b: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            s = (t or "")[:cap]
            _, _, hashes = winnow_select(s, k, w)
            for h in set(hashes):
                ids.append(i)
                hs.append(h)
        return pa.table(
            {"doc": pa.array(ids), "fp": pa.array(hs, pa.int64())}
        )

    fp = ds.map_batches(fingerprints, batch_format="pyarrow").to_pandas()
    pairs: dict[tuple[int, int], int] = {}
    for _, grp in fp.groupby("fp"):
        docs = sorted(set(grp["doc"].astype(int)))
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                key = (docs[i], docs[j])
                pairs[key] = pairs.get(key, 0) + 1
    # verify pass touches CANDIDATE docs only: broadcast the bounded
    # id set, re-scan, pull just those texts to the driver
    cand_ids = sorted({d for key in pairs for d in key})
    if not cand_ids:
        return pd.DataFrame(
            columns=["id_a", "id_b", "n_shared_fp", "lcs_len"]
        ).astype("int64")

    def pick(b: pa.Table, wanted=frozenset(cand_ids)) -> pa.Table:
        keep = [i in wanted for i in b[id_col].to_pylist()]
        t = b.filter(pa.array(keep))
        return pa.table({id_col: t[id_col], text_col: t[text_col]})

    cand = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    texts = dict(
        zip(cand[id_col].astype(int), cand[text_col].fillna(""))
    )
    rows = []
    thresh = w + k - 1
    for (a, b), n_shared in sorted(pairs.items()):
        L = lcs_length(texts[a][:cap], texts[b][:cap])
        if L >= thresh:
            rows.append((a, b, n_shared, L))
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "n_shared_fp", "lcs_len"]
    ).astype("int64")
