"""Incremental (delta) deduplication — classify an APPENDED shard
against an existing base corpus without re-deduplicating the base:
the maintenance shape of a continuously-ingesting training-data lake
(CCNet/CommonCrawl refresh: each new crawl dedupes against the
standing index, never against itself-plus-all-history from scratch).

Per delta doc, in priority order:

- ``dup_exact`` — its md5 content hash occurs in the base
  (match = smallest such base id), or in an EARLIER delta doc
  (smaller doc id; first-wins within the shard);
- ``dup_near``  — some base doc shares a MinHash LSH band and the
  banded signature estimate ≥ threshold (match = smallest such base
  id). Near-dup WITHIN the delta is out of scope by contract — run
  the standing ``minhash_lsh_candidates`` over the shard for that;
- ``unique``    — everything else (match id −1).

100 TB shape: the base is touched exactly twice, both as narrow
projections — its (hash → min id) table and its band-key table — and
in production BOTH are precomputed artifacts (the ``signature_path``
parquet tier of ``ops/dedup.py``); here they are derived in-pipeline
for self-containedness. Delta↔base matching is ONE hash join on
content hash plus ONE hash join on (band, band_hash) — no all-pairs,
no broadcast of corpus-scale state; the per-delta-doc merge happens
on |delta|-bounded frames (the appended shard is small relative to
the corpus by definition — the contract that makes incremental
maintenance worth having).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["delta_dedup"]


def _content_hash_rows(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    hs = [
        hashlib.md5(t.encode()).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return pa.table(
        {"id": batch[id_col].cast(pa.int64()), "h": pa.array(hs, pa.string())}
    )


def _band_rows(batch: pa.Table, text_col: str, id_col: str, num_perm, bands, hash):
    from ocr_service_ray.ops.dedup import _perm_params, minhash_signature

    a, b = _perm_params(num_perm)
    rows_per_band = num_perm // bands
    band_ids, keys, ids, sigs = [], [], [], []
    for doc_id, text in zip(
        batch[id_col].to_pylist(), batch[text_col].to_pylist()
    ):
        sig = minhash_signature(text, a, b, 3, hash)
        # string-encoded signature: Acero hash joins reject list-typed
        # non-key fields ("Data type list<uint64> is not supported"),
        # so the full signature rides the join as its '|' join
        sig_str = "|".join(str(int(v)) for v in sig)
        for band in range(bands):
            chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
            band_ids.append(band)
            keys.append("|".join(str(int(v)) for v in chunk))
            ids.append(int(doc_id))
            sigs.append(sig_str)
    return pa.table(
        {
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(keys, pa.string()),
            "id": pa.array(ids, pa.int64()),
            "sig": pa.array(sigs, pa.string()),
        }
    )


def delta_dedup(
    base_ds,
    delta_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.4,
    hash: str = "oracle",
):
    """pandas ``(doc_id, status, match_id)`` — one row per delta doc,
    sorted by doc_id; ``match_id`` is −1 for unique docs."""
    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.relational import hash_join

    def chash(b: pa.Table) -> pa.Table:
        return _content_hash_rows(b, text_col, id_col)

    def brows(b: pa.Table) -> pa.Table:
        return _band_rows(b, text_col, id_col, num_perm, bands, hash)

    delta_h = delta_ds.map_batches(chash, batch_format="pyarrow")
    base_h = grouped_agg(
        base_ds.map_batches(chash, batch_format="pyarrow"),
        ["h"],
        {"base_match": ("id", "min")},
    )
    # exact vs base: one hash join on content hash
    exact_base = (
        hash_join(delta_h, base_h, on="h").select_columns(["id", "base_match"])
    ).to_pandas()
    if "id" not in exact_base.columns:  # empty join → schema-less frame
        exact_base = pd.DataFrame({"id": [], "base_match": []}).astype("int64")

    # exact vs earlier delta: |delta|-bounded — min id per hash, then
    # a doc is a dup iff the min is strictly smaller than itself
    dh = delta_h.to_pandas()
    first = dh.groupby("h")["id"].min().rename("first_id")
    dh = dh.join(first, on="h")
    exact_delta = dh[dh["id"] > dh["first_id"]][["id", "first_id"]]

    # near vs base: band-key join, in-row signature compare
    delta_b = delta_ds.map_batches(brows, batch_format="pyarrow")
    base_b = base_ds.map_batches(brows, batch_format="pyarrow")

    def rename_right(b: pa.Table) -> pa.Table:
        return b.rename_columns(["bband", "bband_hash", "bid", "bsig"])

    joined = hash_join(
        delta_b,
        base_b.map_batches(rename_right, batch_format="pyarrow"),
        on=("band", "band_hash"),
        right_on=("bband", "bband_hash"),
    )

    def est(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "bid": pa.array([], pa.int64()),
                }
            )
        sa = np.array(
            [s.split("|") for s in b["sig"].to_pylist()], dtype=np.uint64
        )
        sb = np.array(
            [s.split("|") for s in b["bsig"].to_pylist()], dtype=np.uint64
        )
        eq = (sa == sb).sum(axis=1)
        keep = (eq.astype(np.float64) / num_perm) >= threshold
        return pa.table(
            {
                "id": b["id"].filter(pa.array(keep)),
                "bid": b["bid"].filter(pa.array(keep)),
            }
        )

    near = grouped_agg(
        joined.map_batches(est, batch_format="pyarrow"),
        ["id"],
        {"near_match": ("bid", "min")},
    ).to_pandas()
    if "id" not in near.columns:  # empty join → schema-less frame
        near = pd.DataFrame({"id": [], "near_match": []}).astype("int64")

    out = (
        delta_ds.select_columns([id_col])
        .to_pandas()
        .rename(columns={id_col: "id"})
        .sort_values("id")
        .reset_index(drop=True)
    )
    eb = (
        exact_base.groupby("id")["base_match"].min()
        if len(exact_base)
        else pd.Series(dtype="int64", name="base_match")
    )
    out = out.join(eb, on="id")
    out = out.merge(
        exact_delta.rename(columns={"first_id": "delta_match"}),
        on="id",
        how="left",
    )
    out = out.merge(near, on="id", how="left")

    def classify(r):
        if pd.notna(r.get("base_match")) or pd.notna(r.get("delta_match")):
            m = r["base_match"] if pd.notna(r.get("base_match")) else r["delta_match"]
            return "dup_exact", int(m)
        if pd.notna(r.get("near_match")):
            return "dup_near", int(r["near_match"])
        return "unique", -1

    st = out.apply(classify, axis=1, result_type="expand")
    return pd.DataFrame(
        {
            "doc_id": out["id"].astype("int64"),
            "status": st[0].astype("object"),
            "match_id": st[1].astype("int64"),
        }
    )
