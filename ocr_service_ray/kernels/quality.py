"""Quality-scoring kernels.

Reproduces ``/root/reference/services/quality_check.py``:

- ``check_image_quality`` (``:17-54``): scores from raw image metrics —
  sharpness ``min(laplacian_var/100, 1)``, contrast ``min(std/50, 1)``,
  brightness ``1 - |mean-127.5|/127.5``; overall = mean of three;
  issue records with the 0.5 / 0.3 thresholds (``:56-91``).
  The rebuild stores the RAW metrics (variance/std/mean) in the media
  registry and applies the same scoring arithmetic here — no pixels in
  flight (this sandbox has no cv2; real-pixel adapters plug in the same
  raw metrics).
- ``detect_handwritten`` (``:93-138``): OCR line regions with non-empty
  text and confidence < 0.5 become handwritten-suspect area records.
- ``check_quality`` (``:172-223``): overall = 0.3·image + 0.5·ocr_conf
  + 0.2·(1 − 0.1·n_handwritten), clamped to [0,1]; warnings;
  ``needs_review = overall < 0.7 or issues present``.

Documented divergence: a document with no media spans has no image to
score; the rebuild defines its image quality as perfect (all component
scores 1.0, no issues) — the reference always has a file image.
"""

from __future__ import annotations

PERFECT_IMAGE_QUALITY = {
    "sharpness": 1.0,
    "contrast": 1.0,
    "brightness": 1.0,
    "overall_quality": 1.0,
    "issues": [],
}


def check_image_quality(
    sharpness_var: float, contrast_std: float, brightness_mean: float
) -> dict:
    """``quality_check.py:17-54`` over raw metrics."""
    sharpness_score = min(sharpness_var / 100.0, 1.0)
    contrast_score = min(contrast_std / 50.0, 1.0)
    brightness_score = 1.0 - abs(brightness_mean - 127.5) / 127.5
    overall_quality = (sharpness_score + contrast_score + brightness_score) / 3.0
    return {
        "sharpness": sharpness_score,
        "contrast": contrast_score,
        "brightness": brightness_score,
        "overall_quality": overall_quality,
        "issues": _detect_issues(sharpness_score, contrast_score, brightness_score),
    }


def _detect_issues(sharpness: float, contrast: float, brightness: float) -> list[dict]:
    """``quality_check.py:56-91``."""
    issues = []
    if sharpness < 0.5:
        issues.append(
            {
                "type": "blur",
                "severity": "high" if sharpness < 0.3 else "medium",
                "message": "Изображение размыто, может снизить точность OCR",
            }
        )
    if contrast < 0.5:
        issues.append(
            {
                "type": "low_contrast",
                "severity": "medium",
                "message": "Низкий контраст изображения",
            }
        )
    if brightness < 0.5:
        issues.append(
            {
                "type": "brightness",
                "severity": "medium",
                "message": "Неоптимальная яркость изображения",
            }
        )
    return issues


def detect_handwritten(text_regions: list[dict]) -> list[dict]:
    """``quality_check.py:93-138`` (text_regions path). Regions carry
    flat x1/y1/x2/y2 floats here instead of the bbox dict."""
    handwritten_areas = []
    for region in text_regions:
        text = region.get("text", "")
        confidence = region.get("confidence", 0.0)
        if text.strip() and confidence < 0.5:
            x1 = region.get("x1", 0)
            y1 = region.get("y1", 0)
            x2 = region.get("x2", 0)
            y2 = region.get("y2", 0)
            handwritten_areas.append(
                {
                    "type": "handwritten_text",
                    "area": {
                        "x1": x1,
                        "y1": y1,
                        "x2": x2,
                        "y2": y2,
                        "width": x2 - x1,
                        "height": y2 - y1,
                    },
                    "message": "Рукописный текст может быть распознан неточно - перепроверьте",
                    "confidence": confidence,
                    "text": text,
                }
            )
    return handwritten_areas


def check_quality(
    image_quality: dict | None,
    ocr_confidence: float,
    text_regions: list[dict],
) -> dict:
    """``quality_check.py:172-223``. ``image_quality`` is the dict from
    :func:`check_image_quality` for the document's FIRST media span
    (the reference scores the first page image —
    ``core/processor.py:289-299``), or None for a pure-text document
    (→ perfect, see module docstring)."""
    if image_quality is None:
        image_quality = PERFECT_IMAGE_QUALITY
    handwritten_areas = detect_handwritten(text_regions)
    overall_quality = (
        image_quality["overall_quality"] * 0.3
        + ocr_confidence * 0.5
        + (1.0 - len(handwritten_areas) * 0.1) * 0.2
    )
    overall_quality = max(0.0, min(1.0, overall_quality))
    all_issues = list(image_quality.get("issues", [])) + handwritten_areas
    warnings = []
    if image_quality["overall_quality"] < 0.7:
        warnings.append(
            "Уведомление о качестве исходной документации: низкое качество "
            "изображения может не позволить на 100% распознать текст"
        )
    if handwritten_areas:
        warnings.append(
            f"Обнаружено {len(handwritten_areas)} областей с возможным "
            "рукописным текстом - перепроверьте"
        )
    return {
        "overall_quality": overall_quality,
        "image_quality": image_quality,
        "ocr_confidence": ocr_confidence,
        "text_quality": ocr_confidence,
        "issues": all_issues,
        "warnings": warnings,
        "handwritten_areas": handwritten_areas,
        "text_regions": text_regions,
        "needs_review": overall_quality < 0.7 or len(all_issues) > 0,
    }
