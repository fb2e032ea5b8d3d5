"""Derive an interleaved text+media corpus from the plain testdata
``documents`` table (doc_id, text, ...).

The driver's testdata has no span-structured documents; the flagship
pipeline's input shape (BASELINE.json ``input_hint``) is derived from
it DETERMINISTICALLY: every document becomes one text span, and a
fixed doc_id-keyed rule attaches pdf_page / image / area media spans
whose registry rows are generated from the media_ref itself (see
``GenerativeMediaResolver``). No external data; same derivation at
every scale factor.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_service_ray import schema


def derive_documents_batch(batch: pa.Table, replicate: int = 1) -> pa.Table:
    """documents(doc_id:int64, text) batch → DOC_SCHEMA batch.

    ``replicate`` > 1 emits that many deterministic variants per source
    row (bench-scale corpus amplification): variant r rotates the word
    sequence by r so per-document work stays realistic (no degenerate
    cache hits / dedup collapse), while remaining a pure function of
    (doc_id, r).
    """
    doc_ids, spans_col = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        words = text.split()
        for r in range(replicate):
            did = f"tdoc-{doc_id:08d}" if replicate == 1 else f"tdoc-{doc_id:08d}-r{r:03d}"
            if r and words:
                rot = r % len(words)
                var_text = " ".join(words[rot:] + words[:rot])
            else:
                var_text = text
            spans = [{"kind": "text", "text": var_text, "media_ref": "", "offset": 0}]
            off = 1
            if doc_id % 3 == 0:
                spans.append(
                    {"kind": "pdf_page", "text": "", "media_ref": f"m-{did}-0", "offset": off}
                )
                off += 1
            if doc_id % 7 == 0:
                spans.append(
                    {"kind": "image", "text": "", "media_ref": f"m-{did}-1", "offset": off}
                )
                off += 1
            if doc_id % 11 == 0:
                spans.append(
                    {"kind": "area", "text": "", "media_ref": f"m-{did}-2", "offset": off}
                )
                off += 1
            doc_ids.append(did)
            spans_col.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=schema.DOC_SCHEMA
    )


def derived_corpus(sf_dir: str, replicate: int = 1, num_blocks: int = 64):
    """Streaming derivation: read_parquet → map_batches. Returns a
    DOC_SCHEMA Dataset ready for ``run_extraction(..., media=GENERATE_MEDIA)``.

    ``num_blocks`` splits the (single-row-group) source file so the
    derivation itself parallelizes — one read task would otherwise
    serialize the whole corpus through one Python loop (Amdahl's
    bottleneck observed at 32 CPUs)."""
    from ocr_service_ray.sources.readers import read_parquet_clean

    # num_cpus=0.5 deliberately differs from the downstream stages'
    # num_cpus=1: Ray Data only fuses operators with identical resource
    # requests, and fusing this task-map into the extraction actor pool
    # would make the SOURCE block the unit of scheduling (observed: 64
    # coarse tasks starving a 24-actor pool). Derivation is light, so
    # half a CPU is also simply honest.
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=num_blocks,
    ).map_batches(
        lambda b: derive_documents_batch(b, replicate),
        batch_format="pyarrow",
        num_cpus=0.5,
    )
