"""Kernel conformance: quality scoring
(/root/reference/services/quality_check.py) + assembly
(/root/reference/core/processor.py:196-250) + simple spell corrector
(/root/reference/models/spell_corrector.py:192-230)."""

import pytest

from ocr_service_ray.kernels.assemble import (
    AREAS_HEADER,
    MAIN_HEADER,
    PAGE_SEP,
    assemble_document,
    word_count,
)
from ocr_service_ray.kernels.quality import (
    check_image_quality,
    check_quality,
    detect_handwritten,
)
from ocr_service_ray.kernels.spell import simple_spell_correct


def test_image_quality_arithmetic():
    q = check_image_quality(50.0, 25.0, 127.5)
    assert q["sharpness"] == pytest.approx(0.5)
    assert q["contrast"] == pytest.approx(0.5)
    assert q["brightness"] == pytest.approx(1.0)
    assert q["overall_quality"] == pytest.approx(2.0 / 3.0)
    assert q["issues"] == []  # thresholds are strict <


def test_image_quality_issues():
    q = check_image_quality(20.0, 10.0, 250.0)
    types = {i["type"] for i in q["issues"]}
    assert types == {"blur", "low_contrast", "brightness"}
    blur = next(i for i in q["issues"] if i["type"] == "blur")
    assert blur["severity"] == "high"  # sharpness 0.2 < 0.3


def test_image_quality_clamps():
    q = check_image_quality(1000.0, 1000.0, 127.5)
    assert q["sharpness"] == 1.0 and q["contrast"] == 1.0


def test_detect_handwritten():
    regions = [
        {"text": "ok", "confidence": 0.9, "x1": 0, "y1": 0, "x2": 1, "y2": 1},
        {"text": "scrawl", "confidence": 0.3, "x1": 1, "y1": 2, "x2": 4, "y2": 6},
        {"text": "   ", "confidence": 0.1, "x1": 0, "y1": 0, "x2": 1, "y2": 1},
    ]
    hw = detect_handwritten(regions)
    assert len(hw) == 1
    assert hw[0]["text"] == "scrawl"
    assert hw[0]["area"]["width"] == 3 and hw[0]["area"]["height"] == 4


def test_check_quality_weights():
    # 0.3·img + 0.5·ocr + 0.2·(1 − 0.1·n_handwritten)
    img = check_image_quality(100.0, 50.0, 127.5)  # overall 1.0
    rep = check_quality(img, 0.8, [])
    assert rep["overall_quality"] == pytest.approx(0.3 + 0.4 + 0.2)
    assert rep["needs_review"] is False


def test_check_quality_needs_review_threshold():
    img = check_image_quality(100.0, 50.0, 127.5)
    rep = check_quality(img, 0.39, [])  # 0.3 + 0.195 + 0.2 = 0.695 < 0.7
    assert rep["needs_review"] is True
    rep2 = check_quality(img, 0.41, [])
    assert rep2["needs_review"] is False


def test_check_quality_handwritten_penalty_and_issues():
    img = check_image_quality(100.0, 50.0, 127.5)
    regions = [{"text": "x", "confidence": 0.2, "x1": 0, "y1": 0, "x2": 1, "y2": 1}]
    rep = check_quality(img, 1.0, regions)
    assert rep["overall_quality"] == pytest.approx(0.3 + 0.5 + 0.2 * 0.9)
    assert rep["needs_review"] is True  # handwritten area is an issue
    assert len(rep["warnings"]) == 1


def test_check_quality_no_media_is_perfect_image():
    rep = check_quality(None, 1.0, [])
    assert rep["overall_quality"] == pytest.approx(1.0)
    assert rep["needs_review"] is False


def test_word_count():
    assert word_count("a  b\tc\n") == 3
    assert word_count("") == 0


def _span(kind, text, offset, media_ref="", confidence=1.0):
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": offset, "confidence": confidence}


def test_assemble_pages_only():
    out = assemble_document([_span("text", "один", 0), _span("pdf_page", "два", 1, "m1", 0.8)])
    assert out["raw_text"] == "один" + PAGE_SEP + "два"
    assert out["total_pages"] == 2
    assert out["ocr_confidence"] == pytest.approx(0.9)
    assert [s["offset"] for s in out["spans"]] == [0, 1]
    assert out["word_count"] == 2


def test_assemble_areas_first_and_numbering():
    spans = [
        _span("text", "тело", 0),
        _span("area", "", 1, "a1", 0.0),        # empty area → skipped, keeps number 1
        _span("area", "выделено", 2, "a2", 0.7),
    ]
    out = assemble_document(spans)
    assert out["raw_text"] == (
        AREAS_HEADER + "[Область 2]: выделено" + MAIN_HEADER + "тело"
    )
    # Output spans: non-empty areas first, then pages; re-indexed.
    assert [(s["kind"], s["offset"]) for s in out["spans"]] == [("area", 0), ("text", 1)]
    assert out["total_pages"] == 1
    assert out["ocr_confidence"] == pytest.approx(1.0)  # areas excluded from page conf


def test_assemble_orders_by_offset():
    spans = [_span("text", "б", 5), _span("text", "а", 1)]
    out = assemble_document(spans)
    assert out["raw_text"] == "а" + PAGE_SEP + "б"


def test_simple_spell_corrector():
    assert simple_spell_correct("ЗБ0") == "360"
    assert simple_spell_correct("СЛОВО") == "СЛОВО"  # not a number-like token
    assert simple_spell_correct("Вl0") == "810"
