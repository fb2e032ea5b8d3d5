"""Kernel stage: assemble + correct + validate + quality per document.

Stateless pure-kernel work (reference steps c-j of
``/root/reference/core/processor.py:202-376``), run as an actor pool
only so the corrections DB is constructed ONCE per actor from the
broadcast entries (``fn_constructor_kwargs``) instead of being
re-shipped per task. The per-document string kernels are inherently
sequential Python (the reference's order-dependent replace semantics,
SURVEY.md §7.4-1); batching amortizes the Arrow conversion and the
regex machinery is precompiled at module import.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_service_ray import schema
from ocr_service_ray.kernels.assemble import assemble_document
from ocr_service_ray.kernels.correct import CorrectionsDB, correct_text
from ocr_service_ray.kernels.quality import check_image_quality, check_quality
from ocr_service_ray.kernels.validate import (
    extract_important_data,
    validate_critical_fields,
)
from ocr_service_ray.oracle import critical_fields_json, error_row


def _tune_worker_gc() -> None:
    """Per-actor GC tuning (idempotent). The string kernels allocate
    millions of short-lived dicts/strings per batch, none cyclic —
    refcounting frees them. The default gen0 threshold (700) makes the
    cyclic collector walk the heap constantly, which is pure overhead
    here and extra cross-core memory traffic at high worker counts.
    Long-lived state (regexes, the corrections DB) is frozen out of
    collection entirely."""
    import gc

    if getattr(_tune_worker_gc, "_done", False):
        return
    _tune_worker_gc._done = True
    gc.collect()
    gc.freeze()
    gc.set_threshold(50_000, 25, 25)


class KernelStage:
    """EXT_SCHEMA batch in → OUT_SCHEMA batch out."""

    def __init__(
        self,
        corrections: list[tuple[str, str]],
        required_fields=None,
        metrics_name=None,
    ):
        self.db = CorrectionsDB([tuple(p) for p in corrections])
        self.required_fields = required_fields
        from ocr_service_ray.stages.metrics import resolve_collector

        self._metrics = resolve_collector(metrics_name)
        _tune_worker_gc()

    def process_row(self, row: dict) -> dict:
        if row["error"]:
            rec = error_row(row["doc_id"], RuntimeError(row["error"]))
            rec["error"] = row["error"]
            return rec
        assembled = assemble_document(row["ext_spans"])
        raw_text = assembled["raw_text"]
        full_text, corrections = correct_text(raw_text, self.db)
        # One shared field-scan per document: find_field is pure, so
        # validation and important-data extraction reuse the same
        # full-text regex passes (16 → 10 scans per doc).
        scan: dict = {}
        validation = validate_critical_fields(full_text, self.required_fields, _scan=scan)
        important = extract_important_data(full_text, _scan=scan)
        image_quality = (
            check_image_quality(
                row["sharpness_var"], row["contrast_std"], row["brightness_mean"]
            )
            if row["sharpness_var"] is not None
            else None
        )
        report = check_quality(image_quality, assembled["ocr_confidence"], row["regions"])
        needs_review = report["needs_review"] or any(
            not r.valid for r in validation.values()
        )
        return {
            "doc_id": row["doc_id"],
            "spans": assembled["spans"],
            "full_text": full_text,
            "raw_text": raw_text,
            "critical_fields": critical_fields_json(validation),
            "important_inn": important["inn"],
            "important_snils": important["snils"],
            "important_numbers": important["numbers"],
            "important_surnames": important["surnames"],
            "corrections_applied": [
                {
                    "from_": c["from"],
                    "to": c["to"],
                    "confidence": c["confidence"],
                    "method": c["method"],
                }
                for c in corrections
            ],
            "overall_quality": report["overall_quality"],
            "ocr_confidence": assembled["ocr_confidence"],
            "needs_review": needs_review,
            "total_pages": assembled["total_pages"],
            "n_corrections": len(corrections),
            "error": "",
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        _t0 = _time.perf_counter()
        rows = batch.to_pylist()
        out = {name: [] for name in schema.OUT_SCHEMA.names}
        for row in rows:
            rec = self.process_row(row)
            for name in schema.OUT_SCHEMA.names:
                out[name].append(rec[name])
        result = pa.Table.from_pydict(out, schema=schema.OUT_SCHEMA)
        if self._metrics is not None:
            from ocr_service_ray.stages.metrics import record_batch

            record_batch(self._metrics, "KernelStage", result.num_rows, _t0)
        return result


class FusedExtractStage:
    """OCR + kernels in ONE actor (``__call__`` chains the two stages'
    batch functions). Used when the OCR engine is CPU-bound: a single
    pool sized to the node is balanced by construction — no
    inter-pool handoff, half the actor spawns, and the same CPU
    fraction at every cluster size (which is what makes N→4N scaling
    flat). Keep the two-pool layout (``fused=False``) when the engine
    needs its own resource shape (GPUs, bigger heaps)."""

    def __init__(
        self,
        media_source,
        corrections,
        engine: str = "synthetic",
        required_fields=None,
        metrics_name=None,
    ):
        from ocr_service_ray.stages.ocr import OcrStage

        # the fused stage reports as one block unit under its own name
        self.ocr = OcrStage(media_source, engine)
        self.kernel = KernelStage(corrections, required_fields)
        from ocr_service_ray.stages.metrics import resolve_collector

        self._metrics = resolve_collector(metrics_name)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        _t0 = _time.perf_counter()
        result = self.kernel(self.ocr(batch))
        if self._metrics is not None:
            from ocr_service_ray.stages.metrics import record_batch

            record_batch(self._metrics, "FusedExtractStage", result.num_rows, _t0)
        return result
