"""Image preprocessing kernel (M1).

Reproduces the reference's OCR preprocessing
(``/root/reference/core/ocr_engine.py:51-82``): grayscale → upscale so
both sides reach 1500 px (the min-side rule) → CLAHE (clipLimit 2.0,
8×8 tiles) → light non-local-means denoising (5, 7, 21).

The TARGET-DIMENSION arithmetic is pure and ported verbatim
(:func:`upscale_dims` — it also sizes downstream batches). The pixel
kernels use cv2 bit-for-bit when it imports; the sandbox has no cv2,
so the fallback path is a CLEARLY-MARKED stub: mean-grayscale +
nearest-neighbour upscale to the exact reference target dims, CLAHE /
denoise as identity. Swap in cv2 on a real cluster — the stage
interface (ndarray in, ndarray out) is unchanged.
"""

from __future__ import annotations

import numpy as np

MIN_SIDE = 1500  # ocr_engine.py:69
CLAHE_CLIP = 2.0  # ocr_engine.py:76
CLAHE_GRID = (8, 8)
NLM_PARAMS = (5, 7, 21)  # ocr_engine.py:80


def upscale_dims(width: int, height: int) -> tuple[int, int, float]:
    """``ocr_engine.py:67-73`` verbatim: if either side < 1500, scale
    BOTH by max(1500/h, 1500/w); dims truncated with int()."""
    if height < MIN_SIDE or width < MIN_SIDE:
        scale = max(MIN_SIDE / height, MIN_SIDE / width)
        return int(width * scale), int(height * scale), scale
    return width, height, 1.0


def _to_gray(image: np.ndarray) -> np.ndarray:
    if image.ndim == 3:
        try:  # pragma: no cover - cv2 absent in sandbox
            import cv2

            return cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        except ImportError:
            # STUB grayscale: channel mean (cv2 uses BT.601 weights)
            return image.mean(axis=2).astype(np.uint8)
    return image


def preprocess_image(image: np.ndarray) -> np.ndarray:
    """``ocr_engine.py:51-82``. cv2 path is the reference verbatim;
    the numpy fallback keeps the exact target geometry and stubs the
    enhancement kernels (identity)."""
    gray = _to_gray(image)
    height, width = gray.shape
    new_w, new_h, scale = upscale_dims(width, height)
    try:  # pragma: no cover - cv2 absent in sandbox
        import cv2

        if (new_w, new_h) != (width, height):
            gray = cv2.resize(gray, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
        clahe = cv2.createCLAHE(clipLimit=CLAHE_CLIP, tileGridSize=CLAHE_GRID)
        enhanced = clahe.apply(gray)
        return cv2.fastNlMeansDenoising(enhanced, None, *NLM_PARAMS)
    except ImportError:
        if (new_w, new_h) != (width, height):
            # STUB resize: nearest-neighbour to the reference's exact
            # target dims (cv2 uses INTER_CUBIC)
            rows = np.minimum((np.arange(new_h) / scale).astype(np.int64), height - 1)
            cols = np.minimum((np.arange(new_w) / scale).astype(np.int64), width - 1)
            gray = gray[rows][:, cols]
        # STUB CLAHE + denoise: identity (enhancement only affects
        # pixels, which never cross a block boundary in this rebuild)
        return gray
