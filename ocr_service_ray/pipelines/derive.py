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


def derive_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id:int64, text) batch → DOC_SCHEMA batch."""
    doc_ids, spans_col = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        did = f"tdoc-{doc_id:08d}"
        spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
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


def derived_corpus(sf_dir: str):
    """Streaming derivation: read_parquet → map_batches. Returns a
    DOC_SCHEMA Dataset ready for ``run_extraction(..., media=GENERATE_MEDIA)``."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(derive_documents_batch, batch_format="pyarrow")
