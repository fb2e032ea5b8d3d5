"""Output rendering + sinks (SURVEY.md §2.1 S7/S8/S9).

The reference renders results three ways: ``format_output`` → JSON
string or human-readable text (``/root/reference/core/processor.py:
508-533``), per-doc ``.txt`` files with header / per-page sections /
corrections appendix (``scripts/process_dataset_phase1.py:133-202``),
and a corpus-level ``summary.json``
(``scripts/process_dataset_phase1.py:238-251``).

Ray-Data-first mapping: rendering is a trivial stateless projection
(one string column per doc), the file sink is partitioned
``write_parquet`` — one directory per shard so a resumable run can
skip finished partitions (never one giant file, never one file per
doc: 10^12 tiny files is a filesystem DoS). ``summary.json`` is the
driver-side dump of the tiny :func:`ocr_service_ray.pipelines.
flagship.corpus_summary` aggregate.
"""

from __future__ import annotations

import json

import pyarrow as pa

_PAGE_SEP = "\n\n--- Страница ---\n\n"  # core/processor.py:221


def format_output_batch(batch: pa.Table, fmt: str = "json") -> pa.Table:
    """S9 — OUT_SCHEMA batch → {doc_id, rendered}. ``fmt``: "json"
    (``ensure_ascii=False, indent=2`` exactly as ``processor.py:521``)
    or "text" (header + full text + corrections appendix, the
    per-doc-file layout of ``process_dataset_phase1.py:133-202``)."""
    rendered = []
    cols = batch.to_pylist()
    for row in cols:
        if fmt == "json":
            payload = {
                "doc_id": row["doc_id"],
                "full_text": row["full_text"],
                "critical_fields": json.loads(row["critical_fields"])
                if row["critical_fields"]
                else {},
                "overall_quality": row["overall_quality"],
                "ocr_confidence": row["ocr_confidence"],
                "needs_review": row["needs_review"],
                "corrections_applied": row["corrections_applied"],
                "error": row["error"],
            }
            rendered.append(json.dumps(payload, ensure_ascii=False, indent=2))
        elif fmt == "text":
            lines = [
                f"=== Документ: {row['doc_id']} ===",
                f"Качество: {row['overall_quality']:.3f}  "
                f"OCR: {row['ocr_confidence']:.3f}  "
                f"Страниц: {row['total_pages']}",
                "",
                row["full_text"],
            ]
            if row["corrections_applied"]:
                lines += ["", "--- Исправления ---"] + [
                    f"{c['from_']} -> {c['to']} ({c['method']}, {c['confidence']:.2f})"
                    for c in row["corrections_applied"]
                ]
            rendered.append("\n".join(lines))
        else:
            raise ValueError(f"unknown fmt: {fmt}")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "rendered": pa.array(rendered, pa.string()),
        }
    )


def render_output(out_ds, fmt: str = "json"):
    """Lazy S9 projection over the extraction output Dataset."""
    return out_ds.map_batches(
        lambda b: format_output_batch(b, fmt), batch_format="pyarrow"
    )


def write_rendered(out_ds, path: str, fmt: str = "text"):
    """S7 sink — rendered documents to partitioned parquet. The
    reference writes one .txt per doc (``process_dataset_phase1.py:
    133-202``); at 10^12 docs that is a filesystem DoS, so the rebuild
    writes {doc_id, rendered} rows to Lance when available / parquet
    in the sandbox (``pipelines/flagship.write_documents``) — one file
    per block, directory-partitionable by the caller via
    ``run_checkpointed`` (stages/checkpoint.py) for resumability."""
    from ocr_service_ray.pipelines.flagship import write_documents

    write_documents(render_output(out_ds, fmt), path)


def summary_json(out_ds, path: str | None = None) -> str:
    """S8 — corpus summary as a JSON string (optionally written to
    ``path``): the driver-side dump of the global aggregate (A7). The
    aggregate itself is distributed partial+final; only the one-row
    result reaches the driver."""
    from ocr_service_ray.pipelines.flagship import corpus_summary

    payload = corpus_summary(out_ds)
    text = json.dumps(payload, ensure_ascii=False, indent=2, default=float)
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    return text
