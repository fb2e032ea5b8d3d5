"""Pure-Python per-document oracle.

A plain sequential implementation of the reference's full document
flow (``/root/reference/core/processor.py:97-398``) composed from the
same kernels the Ray pipeline uses — the conformance tests run every
document through BOTH and assert span-sequence equality ``(kind,
text, media_ref, order)`` per ``doc_id`` plus equality of the derived
columns. This is the reference's golden-pair comparison
(``utils/dataset_loader.py:26-86``) made assertive (SURVEY.md §5.2).
"""

from __future__ import annotations

import json

from ocr_service_ray.engines import SyntheticOCR
from ocr_service_ray.kernels.assemble import assemble_document
from ocr_service_ray.kernels.correct import CorrectionsDB, correct_text
from ocr_service_ray.kernels.quality import check_image_quality, check_quality
from ocr_service_ray.kernels.validate import (
    extract_important_data,
    validate_critical_fields,
)

MEDIA_KINDS = ("image", "pdf_page", "area")
# Kinds whose OCR regions feed handwritten detection. Mirrors the
# reference: PDF pages merge with empty detailed_data
# (core/processor.py:225-232) so only the single-image path carries
# text_regions into the quality check (core/processor.py:322-324).
REGION_KINDS = ("image",)


def extract_spans(doc: dict, media: dict[str, dict], engine=None) -> tuple[list[dict], list[dict], dict | None]:
    """Run extraction over one document's spans.

    Returns (extracted_spans, text_regions, first_image_metrics).
    Raises KeyError for a dangling media_ref — callers convert that to
    a continue-on-error row (``core/processor.py:431-438`` semantics).
    """
    engine = engine or SyntheticOCR()
    extracted = []
    text_regions: list[dict] = []
    first_metrics: dict | None = None
    for span in doc["spans"]:
        kind = span["kind"]
        if kind == "text":
            extracted.append(
                {
                    "kind": kind,
                    "text": span["text"],
                    "media_ref": span["media_ref"],
                    "offset": span["offset"],
                    "confidence": 1.0,
                }
            )
            continue
        if kind not in MEDIA_KINDS:
            raise KeyError(f"unknown span kind: {kind!r}")
        m = media[span["media_ref"]]
        rect = m.get("area_rect")
        if kind == "area" and rect is not None and hasattr(engine, "recognize_area"):
            # M17: area rects arrive in DPI-300 space — scale by the
            # actual-size ratio (fallback 3.0) before the hi-DPI crop
            # (core/processor.py:131-167), then OCR only that area.
            from ocr_service_ray.kernels.geometry import scale_area_for_media

            ocr = engine.recognize_area(m["payload"], scale_area_for_media(rect, m))
        else:
            ocr = engine.recognize(m["payload"])
        extracted.append(
            {
                "kind": kind,
                "text": ocr["text"],
                "media_ref": span["media_ref"],
                "offset": span["offset"],
                "confidence": ocr["confidence"],
            }
        )
        if kind in REGION_KINDS:
            text_regions.extend(ocr["regions"])
        if kind != "area" and first_metrics is None:
            # Quality is scored on the FIRST page image
            # (core/processor.py:289-299); area crops never feed it.
            first_metrics = {
                "sharpness_var": m["sharpness_var"],
                "contrast_std": m["contrast_std"],
                "brightness_mean": m["brightness_mean"],
            }
    return extracted, text_regions, first_metrics


# Per-field fragment cache for the dominant "field not found" case:
# that ValidationResult is a constant per field, so its serialized
# fragment is too. Fragments are produced BY json.dumps itself (outer
# braces stripped) and reassembled in sorted-field order — the output
# bytes are identical to one whole-dict dumps with sort_keys=True.
_FRAG_CACHE: dict[tuple, str] = {}


def _field_fragment(field: str, r) -> str:
    key = (field, r.value, r.confidence, r.valid, r.message, r.suggested_correction)
    frag = _FRAG_CACHE.get(key)
    if frag is None:
        frag = json.dumps(
            {
                field: {
                    "value": r.value,
                    "confidence": r.confidence,
                    "valid": r.valid,
                    "message": r.message,
                    "suggested_correction": r.suggested_correction,
                }
            },
            ensure_ascii=False,
            sort_keys=True,
            separators=(",", ":"),
        )[1:-1]
        if len(_FRAG_CACHE) < 100_000:
            _FRAG_CACHE[key] = frag
    return frag


def critical_fields_json(results: dict) -> str:
    """Deterministic JSON rendering of the critical-fields map
    (``core/processor.py:355-364``); sorted keys, ensure_ascii=False
    like the reference's JSON outputs (``core/processor.py:521``)."""
    return "{" + ",".join(
        _field_fragment(field, results[field]) for field in sorted(results)
    ) + "}"


def process_document(
    doc: dict,
    media: dict[str, dict],
    db: CorrectionsDB,
    required_fields: list[str] | None = None,
    engine=None,
) -> dict:
    """Full per-document flow (``core/processor.py:97-398`` order):
    extract → assemble → correct → validate → quality → important data.
    Returns a flat dict matching ``schema.OUT_SCHEMA``."""
    extracted, text_regions, first_metrics = extract_spans(doc, media, engine)
    assembled = assemble_document(extracted)
    raw_text = assembled["raw_text"]
    full_text, corrections = correct_text(raw_text, db)
    validation = validate_critical_fields(full_text, required_fields)
    important = extract_important_data(full_text)
    image_quality = (
        check_image_quality(
            first_metrics["sharpness_var"],
            first_metrics["contrast_std"],
            first_metrics["brightness_mean"],
        )
        if first_metrics is not None
        else None
    )
    report = check_quality(image_quality, assembled["ocr_confidence"], text_regions)
    needs_review = report["needs_review"] or any(
        not r.valid for r in validation.values()
    )
    return {
        "doc_id": doc["doc_id"],
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


def error_row(doc_id: str, err: Exception) -> dict:
    """Continue-on-error row (``core/processor.py:431-438``)."""
    return {
        "doc_id": doc_id,
        "spans": [],
        "full_text": "",
        "raw_text": "",
        "critical_fields": "{}",
        "important_inn": [],
        "important_snils": [],
        "important_numbers": [],
        "important_surnames": [],
        "corrections_applied": [],
        "overall_quality": 0.0,
        "ocr_confidence": 0.0,
        "needs_review": True,
        "total_pages": 0,
        "n_corrections": 0,
        "error": f"{type(err).__name__}: {err}",
    }
