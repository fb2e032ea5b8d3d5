"""Document assembly kernel — the exact-match surface.

Reproduces the reference's deterministic text assembly
(``/root/reference/core/processor.py:117-250``) over the interleaved
span model:

- input spans are processed in ``offset`` order;
- ``kind="area"`` spans (the reference's hi-DPI selected areas,
  ``processor.py:149-197``) render as ``[Область {i}]: {text}`` lines
  — ``i`` is the 1-based position among ALL area spans (the reference
  numbers by input index), but areas whose extracted text is empty are
  skipped from both the text block and the output records
  (``processor.py:170-187`` — ``if area_result.get('text')``);
- every non-area span is one "page": page texts are joined with
  ``'\\n\\n--- Страница ---\\n\\n'`` (``processor.py:221``), document
  confidence is the MEAN of page confidences (``:223``), word count is
  the SUM of page word counts (``:229``);
- when any area text exists, ``raw_text`` = areas block +
  ``'\\n\\n--- ОСНОВНОЙ ТЕКСТ ---\\n\\n'`` + page text
  (``processor.py:196-197, 248-250``).

The output span sequence — the per-row invariant ``(kind, text,
media_ref, order)`` — is: non-empty areas first (offset order), then
all non-area spans (offset order), re-indexed 0..n-1. This mirrors
the reference result layout (``selected_areas`` before ``pages`` in
``processor.py:354-370``) with the assembled ordering made explicit.
"""

from __future__ import annotations

PAGE_SEP = "\n\n--- Страница ---\n\n"
AREAS_HEADER = "\n\n--- ВЫДЕЛЕННЫЕ ОБЛАСТИ (DPI 900) ---\n\n"
MAIN_HEADER = "\n\n--- ОСНОВНОЙ ТЕКСТ ---\n\n"


def word_count(text: str) -> int:
    """``core/ocr_engine.py:281``."""
    return len([w for w in text.split() if w.strip()])


def assemble_document(extracted_spans: list[dict]) -> dict:
    """Fold one document's extracted spans into the assembled record.

    ``extracted_spans``: dicts with keys ``kind, text, media_ref,
    offset, confidence`` — text spans carry their payload (confidence
    1.0), media spans carry the OCR engine's text and mean line
    confidence. Returns raw_text, ordered output spans, total_pages,
    ocr_confidence, word_count.

    This is aggregation A1 (SURVEY.md §2.5): an in-kernel fold — spans
    stay list-typed inside the row, so the per-document merge needs NO
    shuffle.
    """
    ordered = sorted(extracted_spans, key=lambda s: s["offset"])
    areas = [s for s in ordered if s["kind"] == "area"]
    pages = [s for s in ordered if s["kind"] != "area"]

    area_texts = []
    out_spans: list[dict] = []
    for i, span in enumerate(areas):
        if span["text"]:
            area_texts.append(f"[Область {i + 1}]: {span['text']}")
            out_spans.append(span)

    out_spans.extend(pages)

    page_texts = [s["text"] for s in pages]
    main_text = PAGE_SEP.join(page_texts)
    if area_texts:
        raw_text = AREAS_HEADER + "\n\n".join(area_texts) + MAIN_HEADER + main_text
    else:
        raw_text = main_text

    confidences = [s["confidence"] for s in pages]
    ocr_confidence = sum(confidences) / len(confidences) if confidences else 0.0

    return {
        "raw_text": raw_text,
        "spans": [
            {
                "kind": s["kind"],
                "text": s["text"],
                "media_ref": s["media_ref"],
                "offset": idx,
            }
            for idx, s in enumerate(out_spans)
        ],
        "total_pages": len(pages),
        "ocr_confidence": ocr_confidence,
        "word_count": sum(word_count(t) for t in page_texts),
    }
