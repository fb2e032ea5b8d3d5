"""Arrow schemas for the interleaved-document data model.

The input shape is the authoritative one from BASELINE.json
``input_hint``: a table of interleaved text + media documents,
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
It corresponds 1:1 to the reference's document model (see SURVEY.md
§1.3): the reference's ``pages`` list (``core/processor.py:211-219``)
are spans with ``kind="pdf_page"``, its OCR ``text_regions``
(``core/ocr_engine.py:254-267``) become text produced from media
spans, and its ``selected_areas_data`` (``core/processor.py:175-187``)
are ``kind="area"`` spans.

Lance is the nominal storage format; this sandbox has no ``lance``
package, so parquet is the documented fallback (same Arrow schemas).
"""

from __future__ import annotations

import pyarrow as pa

# A span of a document: ordered unit of content.
#   kind: "text" | "image" | "pdf_page" | "area"
#   text: raw text payload ("" for media spans before extraction)
#   media_ref: key into the media registry ("" for text spans)
#   offset: position within the document
SPAN = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
    ]
)

# Media registry: one row per media_ref. Stands in for the reference's
# on-disk PDF/JPG files (core/ocr_engine.py:84-119). ``payload`` is the
# opaque binary the OCR engine consumes; the planted image metrics let
# check_image_quality (services/quality_check.py:17-54) run without
# real pixels (raw values, scored by the kernel).
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("payload", pa.binary()),
        ("sharpness_var", pa.float64()),   # Laplacian-variance analogue
        ("contrast_std", pa.float64()),    # grey std analogue
        ("brightness_mean", pa.float64()), # grey mean analogue (0..255)
    ]
)

# OCR line region, mirroring the reference's per-line span
# (core/ocr_engine.py:254-267).
REGION = pa.struct(
    [
        ("text", pa.string()),
        ("confidence", pa.float64()),
        ("x1", pa.float64()),
        ("y1", pa.float64()),
        ("x2", pa.float64()),
        ("y2", pa.float64()),
    ]
)

CORRECTION = pa.struct(
    [
        ("from_", pa.string()),
        ("to", pa.string()),
        ("confidence", pa.float64()),
        ("method", pa.string()),
    ]
)

# Output table: one row per document, mirroring the reference result
# dict (core/processor.py:346-376). ``spans`` is the exact-match
# surface: (kind, text, media_ref, order) per doc_id.
OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("full_text", pa.string()),
        ("raw_text", pa.string()),
        ("critical_fields", pa.string()),  # JSON (sorted keys) — deterministic
        ("important_inn", pa.list_(pa.string())),
        ("important_snils", pa.list_(pa.string())),
        ("important_numbers", pa.list_(pa.string())),
        ("important_surnames", pa.list_(pa.string())),
        ("corrections_applied", pa.list_(CORRECTION)),
        ("overall_quality", pa.float64()),
        ("ocr_confidence", pa.float64()),
        ("needs_review", pa.bool_()),
        ("total_pages", pa.int32()),
        ("n_corrections", pa.int32()),
        ("error", pa.string()),  # "" on success; continue-on-error semantics
    ]
)

# Feedback event rows (services/feedback_collector.py:92-103): the
# append-only sink replacing the reference's rewritten JSON file.
FEEDBACK_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("type", pa.string()),  # correction | quality | document_type
        ("original", pa.string()),
        ("corrected", pa.string()),
        ("doc_id", pa.string()),
        ("context", pa.string()),
        ("confidence", pa.float64()),
        ("applied", pa.bool_()),
        ("ts", pa.timestamp("us")),
    ]
)
