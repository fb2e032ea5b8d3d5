"""Area detection (T7) — the reference's ``AreaDetector``
(``/root/reference/services/area_detector.py:17-84``) with the cv2
pixel kernels replaced by pure-numpy equivalents (cv2 is not in this
sandbox; when cv2 imports, the adapter uses it for bit-parity with the
reference's Otsu + findContours).

Semantics kept verbatim:
- grayscale → Otsu binarization → external-contour bounding boxes;
- boxes are kept only when ``w > 50 and h > 50``
  (``area_detector.py:75``);
- no boxes → the whole image as one ``full_document`` area
  (``area_detector.py:36-43``).

The numpy path: Otsu threshold by exhaustive between-class-variance
maximization over the 256-bin histogram (the textbook definition cv2
implements), connected components by iterative label propagation
(4-connectivity — bounding boxes are identical to
``cv2.findContours(RETR_EXTERNAL)`` boxes for filled regions).
"""

from __future__ import annotations

import numpy as np

MIN_SIDE = 50  # area_detector.py:75


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's threshold over a uint8 image — max between-class
    variance, as cv2.THRESH_OTSU computes it."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    bins = np.arange(256, dtype=np.float64)
    w0 = np.cumsum(hist)
    w1 = total - w0
    mu0 = np.cumsum(hist * bins)
    mu_total = mu0[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        m0 = mu0 / w0
        m1 = (mu_total - mu0) / w1
        between = w0 * w1 * (m0 - m1) ** 2
    between[~np.isfinite(between)] = -1.0
    return int(between.argmax())


def _connected_boxes(binary: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Bounding boxes (x, y, w, h) of 4-connected foreground regions —
    the numpy stand-in for cv2.findContours + boundingRect."""
    visited = np.zeros(binary.shape, dtype=bool)
    boxes = []
    rows, cols = binary.shape
    fg = np.argwhere(binary)
    for r0, c0 in fg:
        if visited[r0, c0]:
            continue
        stack = [(int(r0), int(c0))]
        visited[r0, c0] = True
        rmin = rmax = int(r0)
        cmin = cmax = int(c0)
        while stack:
            r, c = stack.pop()
            rmin, rmax = min(rmin, r), max(rmax, r)
            cmin, cmax = min(cmin, c), max(cmax, c)
            for nr, nc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                if 0 <= nr < rows and 0 <= nc < cols and binary[nr, nc] and not visited[nr, nc]:
                    visited[nr, nc] = True
                    stack.append((nr, nc))
        boxes.append((cmin, rmin, cmax - cmin + 1, rmax - rmin + 1))
    return boxes


class AreaDetector:
    """``area_detector.py:10-84`` semantics over a numpy image."""

    def detect_areas(self, image: np.ndarray, template: str | None = None) -> list[dict]:
        height, width = image.shape[:2]
        areas = self._detect_by_contours(image)
        if not areas:
            areas = [
                {"x1": 0, "y1": 0, "x2": int(width), "y2": int(height), "type": "full_document"}
            ]
        return areas

    def _detect_by_contours(self, image: np.ndarray) -> list[dict]:
        gray = image.mean(axis=2).astype(np.uint8) if image.ndim == 3 else image
        try:  # pragma: no cover - cv2 absent in sandbox
            import cv2

            _, binary = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
            contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            boxes = [cv2.boundingRect(c) for c in contours]
        except ImportError:
            thresh = otsu_threshold(gray)
            binary = gray > thresh
            boxes = _connected_boxes(binary)
        areas = []
        for x, y, w, h in boxes:
            if w > MIN_SIDE and h > MIN_SIDE:  # area_detector.py:75
                areas.append(
                    {"x1": int(x), "y1": int(y), "x2": int(x + w), "y2": int(y + h), "type": "text_block"}
                )
        return areas
