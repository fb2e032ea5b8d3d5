"""Fixed-size token-window document chunking with stride overlap.

The canonical LLM-pretraining preprocessing move: split every
document into windows of ``chunk_size`` tokens advancing by
``stride`` tokens (overlap = chunk_size - stride), so long documents
become multiple training rows and context is preserved across the
seams. Each input row expands independently — a pure flat-map, zero
shuffle, streams at any scale.

Token semantics are the repo-wide single-space split (``ops/text.py``
``n_tokens = count(' ') + 1``), which makes the whole operator
exactly SQL-reproducible: DuckDB's ``string_split(text, ' ')`` plus a
lateral ``generate_series`` over start offsets rebuilds byte-equal
chunk text.

Per-row work is O(len(text)); the only Python-level loop is over the
rows of one batch (string re-assembly is not expressible as an Arrow
kernel), with the split/join done by C-level str ops. For multi-GB
documents, cap ``batch_size`` upstream so a batch x concurrency fits
the worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chunk_tokens(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
):
    """Explode each document into overlapping token windows.

    Emits ``(id_col, chunk_idx, n_chunk_tokens, chunk_text)``: chunk
    ``i`` covers tokens ``[i*stride, i*stride + chunk_size)`` of the
    single-space token list; the final window may be short; every
    document emits at least one chunk (empty text -> one 1-token
    chunk, matching ``count(' ')+1`` semantics).
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_idx, out_n, out_text = [], [], [], []
        for did, t in zip(ids, texts):
            toks = (t or "").split(" ")
            n = len(toks)
            for ci, start in enumerate(range(0, n, stride)):
                window = toks[start : start + chunk_size]
                out_id.append(did)
                out_idx.append(ci)
                out_n.append(len(window))
                out_text.append(" ".join(window))
        return pa.table(
            {
                id_col: pa.array(out_id, type=b[id_col].type),
                "chunk_idx": pa.array(np.asarray(out_idx, dtype=np.int64)),
                "n_chunk_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
                "chunk_text": pa.array(out_text, type=pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def span_corruption(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    every: int = 7,
    phase: int = 3,
    sentinel: str = "<mask>",
):
    """T5-style span-corruption pair generation, deterministic and
    SQL-reproducible: token positions p (0-based, single-space split)
    with ``p % every == phase`` are replaced by ``sentinel`` in the
    corrupted text; the masked tokens, in order, form the target.
    Emits (id_col, corrupted, target, n_masked). A pure flat map —
    zero shuffle; real pretraining pipelines swap the positional rule
    for a seeded RNG, everything else is this plumbing."""

    def explode(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        corrupted, target, n_masked = [], [], []
        for t in texts:
            toks = (t or "").split(" ")
            masked = [tok for p, tok in enumerate(toks) if p % every == phase]
            corrupted.append(
                " ".join(
                    sentinel if p % every == phase else tok
                    for p, tok in enumerate(toks)
                )
            )
            target.append(" ".join(masked))
            n_masked.append(len(masked))
        return pa.table(
            {
                id_col: b[id_col],
                "corrupted": pa.array(corrupted, type=pa.string()),
                "target": pa.array(target, type=pa.string()),
                "n_masked": pa.array(np.asarray(n_masked, dtype=np.int64)),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def keyword_contexts(
    ds,
    term: str,
    n_ctx: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Keyword-in-context (KWIC) extraction: one row per occurrence of
    ``term`` (exact token match on the single-space split) with the
    ``n_ctx`` tokens either side — the concordance/grep-with-context
    primitive for corpus inspection. Pure flat map, zero shuffle;
    byte-exact vs the SQL indexed-lambda + list-slice oracle."""

    def explode(b: pa.Table) -> pa.Table:
        out_id, out_pos, out_l, out_r = [], [], [], []
        for did, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            toks = (t or "").split(" ")
            for p, tok in enumerate(toks):
                if tok != term:
                    continue
                out_id.append(did)
                out_pos.append(p)
                out_l.append(" ".join(toks[max(0, p - n_ctx) : p]))
                out_r.append(" ".join(toks[p + 1 : p + 1 + n_ctx]))
        return pa.table(
            {
                id_col: pa.array(out_id, type=b[id_col].type),
                "pos": pa.array(np.asarray(out_pos, dtype=np.int64)),
                "left_ctx": pa.array(out_l, type=pa.string()),
                "right_ctx": pa.array(out_r, type=pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def content_defined_chunks(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    divisor: int = 16,
    hash: str = "oracle",
):
    """Content-defined chunking (the Rabin/CDC storage-dedup move,
    word-level): a chunk boundary falls AFTER token ``j`` wherever the
    trigram hash H(t[j-2], t[j-1], t[j]) ≡ 0 (mod ``divisor``) — so
    an insertion early in a document shifts only the chunk it lands
    in, and identical passages produce identical chunks REGARDLESS of
    their offset (what fixed-size ``chunk_tokens`` windows cannot do;
    this is why storage dedup and plagiarism pipelines use CDC).

    Returns the exploded chunk table ``(doc_id, chunk_idx, n_tokens,
    chunk_md5)`` — a pure flat-map, zero shuffle; compose with a
    grouped count on ``chunk_md5`` for corpus-level chunk-dedup stats.

    ``hash="oracle"`` (default) uses md5-derived trigram hashes so
    DuckDB recomputes the boundaries from scratch; ``hash="fast"``
    switches to the vectorized polynomial mode (``ops/hashing``) for
    production runs — boundaries differ, semantics don't. Expected
    chunk length is ``divisor`` tokens; no min/max clamps (documented
    contract — clamping breaks the offset-independence property the
    op exists for).
    """
    import hashlib

    def explode(b: pa.Table) -> pa.Table:
        out_id, out_idx, out_n, out_md5 = [], [], [], []
        for did, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            toks = (t or "").split(" ")
            L = len(toks)
            if hash == "fast":
                from ocr_service_ray.ops.hashing import (
                    gram_hashes_fast,
                    hash_tokens_fast,
                )

                g = (
                    gram_hashes_fast(hash_tokens_fast(toks), 3)
                    if L >= 3
                    else np.array([], dtype=np.uint64)
                )
                flags = np.zeros(L, dtype=np.int64)
                if L >= 3:
                    flags[2:] = (g % divisor == 0).astype(np.int64)
            else:
                flags = np.zeros(L, dtype=np.int64)
                for j in range(2, L):
                    h = int(
                        hashlib.md5(
                            f"{toks[j - 2]} {toks[j - 1]} {toks[j]}".encode()
                        ).hexdigest()[:16],
                        16,
                    )
                    flags[j] = 1 if h % divisor == 0 else 0
            # a boundary AFTER token p starts a new chunk at p+1; a
            # flag on the LAST token starts nothing (no empty chunks)
            if L == 0:
                continue
            bpos = np.flatnonzero(flags[: L - 1]) if L > 1 else np.array([], int)
            starts = [0] + [int(p) + 1 for p in bpos]
            ends = [int(p) + 1 for p in bpos] + [L]
            for c, (s_, e_) in enumerate(zip(starts, ends)):
                sel = toks[s_:e_]
                out_id.append(did)
                out_idx.append(c)
                out_n.append(len(sel))
                out_md5.append(hashlib.md5(" ".join(sel).encode()).hexdigest())
        return pa.table(
            {
                id_col: pa.array(out_id, type=b[id_col].type),
                "chunk_idx": pa.array(np.asarray(out_idx, dtype=np.int64)),
                "n_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
                "chunk_md5": pa.array(out_md5, type=pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
