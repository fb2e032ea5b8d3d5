"""DSIR-style hashed n-gram importance scoring — data selection for
language-model training (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): rank a raw pool of
documents by how target-like their hashed n-gram feature profile is.

Why hashed features: the distinct-gram vocabulary of a web corpus is
billions of entries (the exact failure mode of a full-vocab broadcast,
see ``ops/ranking.py``), but DSIR folds every unigram+bigram into a
FIXED number of hash buckets, so both distributions — target and raw
— are ``n_buckets``-bounded tables regardless of corpus size. That
makes the whole op two scans and zero data shuffles at 100 TB:

1. **Pass 1 (one scan, combiner):** each block explodes its docs to
   (side, bucket) gram counts and pre-aggregates in-block; one
   ``grouped_agg`` merges ≤ 2·n_buckets rows per block. The merged
   (target_count, raw_count) table lives on the driver — bounded by
   ``n_buckets``, never by data.
2. **Weights:** per bucket, the integer odds ratio
   ``w[b] = ((target_count+1) * 1_000_000) // (raw_count+1)``
   (+1 Laplace smoothing). Integer floor division, no logs — the
   repo-wide no-transcendentals-in-oracled-output discipline
   (``ops/ranking.py``); the log variant changes per-gram weights by
   a monotone transform and is not the oracled configuration.
3. **Pass 2 (one scan, broadcast):** the ``n_buckets`` weight array
   is ``ray.put`` once; each block scores its raw-pool docs —
   ``score = Σ w[bucket(gram)]`` over all gram OCCURRENCES (DSIR sums
   per-occurrence log-ratios; we sum per-occurrence integer odds) —
   and emits (doc_id, score, n_grams, avg_weight). A combiner top-k
   (``ops/relational.topk_fold`` shape: block-local heads, one small
   merge) yields the selection; deterministic rank replaces DSIR's
   Gumbel resampling (divergence documented: sampling needs RNG, the
   oracle discipline forbids it; top-rank is the zero-temperature
   limit).

Hashing: gram → md5 → first 16 hex chars as uint64 → ``% n_buckets``
(the dedup-family discipline — SQL recomputes the identical bucket
via ``_md5_u64_sql``). ``hash="fast"`` switches to the vectorized
splitmix path (``ops/hashing.gram_hashes_fast``) for production runs;
the two modes differ only in bucket assignment, not semantics.

Tokenization: single-space split (repo-wide convention, =
``string_split(text, ' ')``); grams are unigrams plus
space-joined bigrams.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["importance_scores", "gram_buckets"]


def gram_buckets(text: str, n_buckets: int, hash: str = "md5") -> np.ndarray:
    """Bucket ids (int64) of every unigram and bigram occurrence of a
    single-space-tokenized text, in token order (unigrams first, then
    bigrams — order is irrelevant downstream: only counts matter)."""
    toks = text.split(" ")
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if hash == "fast":
        from ocr_service_ray.ops.hashing import hash_tokens_fast

        return (hash_tokens_fast(grams).astype(np.uint64) % n_buckets).astype(
            np.int64
        )
    return np.array(
        [
            int(hashlib.md5(g.encode()).hexdigest()[:16], 16) % n_buckets
            for g in grams
        ],
        dtype=np.int64,
    )


def _bucket_counts(ds, is_target, text_col: str, n_buckets: int, hash: str):
    """One scan → pandas (bucket, target_count, raw_count), bounded by
    ``n_buckets``. ``is_target(batch) -> np.ndarray[bool]`` decides the
    side per row (evaluated in-kernel — no second read)."""
    from ocr_service_ray.ops.agg import grouped_agg

    def explode(batch: pa.Table) -> pa.Table:
        tgt = is_target(batch)
        bks: list[np.ndarray] = []
        sides: list[np.ndarray] = []
        for t, s in zip(batch[text_col].to_pylist(), tgt):
            b = gram_buckets(t, n_buckets, hash)
            bks.append(b)
            sides.append(np.full(len(b), bool(s)))
        if not bks:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "is_t": pa.array([], pa.bool_())}
            )
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(bks)),
                "is_t": pa.array(np.concatenate(sides)),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    agg = grouped_agg(pairs, ["bucket", "is_t"], {"n": (None, "count")}).to_pandas()
    out = {}
    for _, r in agg.iterrows():
        row = out.setdefault(int(r["bucket"]), [0, 0])
        row[0 if r["is_t"] else 1] = int(r["n"])
    return out  # bucket -> [target_count, raw_count]


def importance_scores(
    ds,
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    top_n: int = 100,
    scale: int = 1_000_000,
    hash: str = "md5",
):
    """Rank the RAW pool (rows where ``is_target`` is false) by
    target-likeness. Returns a Dataset ``(doc_id, score, n_grams,
    avg_weight)`` — the ``top_n`` docs by (avg_weight DESC, doc_id),
    where ``avg_weight = score // n_grams`` (integer; length-
    normalized so long docs don't win by volume alone). Docs with zero
    grams (empty text still yields one unigram, so: never) cannot
    occur; ties break on doc_id.
    """
    import ray

    counts = _bucket_counts(ds, is_target, text_col, n_buckets, hash)
    weights = np.zeros(n_buckets, dtype=np.int64)
    for b in range(n_buckets):
        ct, cr = counts.get(b, (0, 0))
        weights[b] = ((ct + 1) * scale) // (cr + 1)
    w_ref = ray.put(weights)

    class Score:
        def __init__(self):
            self.w = ray.get(w_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tgt = is_target(batch)
            ids, scores, ngs = [], [], []
            for key, t, s in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist(), tgt
            ):
                if s:
                    continue  # score the raw pool only (the DSIR selection set)
                b = gram_buckets(t, n_buckets, hash)
                ids.append(key)
                scores.append(int(self.w[b].sum()))
                ngs.append(len(b))
            sc = np.array(scores, dtype=np.int64)
            ng = np.array(ngs, dtype=np.int64)
            tbl = pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "score": pa.array(sc),
                    "n_grams": pa.array(ng),
                    "avg_weight": pa.array(
                        sc // np.maximum(ng, 1), pa.int64()
                    ),
                }
            )
            # block-local head: keep only the local top_n — the
            # combiner that bounds what the final sort sees.
            if tbl.num_rows > top_n:
                order = sorted(
                    range(tbl.num_rows),
                    key=lambda i: (-tbl["avg_weight"][i].as_py(), ids[i]),
                )[:top_n]
                tbl = tbl.take(pa.array(order, pa.int64()))
            return tbl

        is_target_fn = staticmethod(is_target)

    import ray.data  # noqa: F401

    # autoscaling (1, 4), NOT fixed 4: a fixed-size pool pre-scales to
    # its min size and on a small cluster (the 4-CPU test session) can
    # grab every CPU before an upstream all-to-all has run — observed
    # as a placement deadlock (3 of 4 actors placed, repartition tasks
    # starved). min=1 always leaves headroom for upstream tasks.
    heads = ds.map_batches(Score, concurrency=(1, 4), batch_format="pyarrow")
    merged = heads.to_pandas()
    merged = merged.sort_values(
        ["avg_weight", id_col], ascending=[False, True]
    ).head(top_n)
    return merged.reset_index(drop=True)
