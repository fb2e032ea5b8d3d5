"""Image preprocessing kernel (M1).

Reproduces the reference's OCR preprocessing
(``/root/reference/core/ocr_engine.py:51-82``): grayscale → upscale so
both sides reach 1500 px (the min-side rule) → CLAHE (clipLimit 2.0,
8×8 tiles) → light non-local-means denoising (5, 7, 21).

The TARGET-DIMENSION arithmetic is pure and ported verbatim
(:func:`upscale_dims` — it also sizes downstream batches). The pixel
kernels use cv2 bit-for-bit when it imports; without cv2 the numpy
path is now REAL, not a stub:

- grayscale: cv2's exact BT.601 fixed-point arithmetic
  (``(B*1868 + G*9617 + R*4899 + 2^13) >> 14`` — bit-identical to
  ``cv2.cvtColor(..., COLOR_BGR2GRAY)``);
- resize: true separable bicubic interpolation (Keys kernel,
  A = −0.75 — cv2's INTER_CUBIC kernel), pixel-center alignment
  (``src = (dst + 0.5)/scale − 0.5``), replicate borders. Float
  arithmetic, so the last bit may differ from cv2's fixed-point
  tables; geometry and kernel are the same.
- CLAHE: faithful reimplementation of the classic algorithm as cv2
  documents it (per-tile clipped+redistributed histogram LUTs,
  bilinear blending between the four surrounding tile LUTs).
- denoise: a REAL vectorized non-local-means (shifted-window SSD via
  box sums) — O(search² · n) ≈ 441 passes, far too slow for the
  1500px hot path in pure numpy, so it is opt-in
  (``preprocess_image(..., denoise=True)``) and exercised by tests
  on small images; the default path stops after CLAHE.
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


def bt601_gray(image: np.ndarray) -> np.ndarray:
    """BGR → grayscale with cv2's exact fixed-point BT.601 weights:
    bit-identical to ``cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)``."""
    b = image[:, :, 0].astype(np.uint32)
    g = image[:, :, 1].astype(np.uint32)
    r = image[:, :, 2].astype(np.uint32)
    return ((b * 1868 + g * 9617 + r * 4899 + (1 << 13)) >> 14).astype(np.uint8)


def _to_gray(image: np.ndarray) -> np.ndarray:
    if image.ndim == 3:
        try:  # pragma: no cover - cv2 absent in sandbox
            import cv2

            return cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        except ImportError:
            return bt601_gray(image)
    return image


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys bicubic kernel weights for the 4 taps around fractional
    offsets ``t`` (cv2's INTER_CUBIC uses A = −0.75). Returns
    (len(t), 4)."""
    # tap distances: 1+t, t, 1-t, 2-t
    d = np.stack([1.0 + t, t, 1.0 - t, 2.0 - t], axis=1)
    ad = np.abs(d)
    w = np.where(
        ad <= 1.0,
        (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0,
        a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a,
    )
    return w


def _axis_taps(n_dst: int, n_src: int) -> tuple[np.ndarray, np.ndarray]:
    """(indices (n_dst, 4), weights (n_dst, 4)) for one axis with
    pixel-center alignment and replicate borders."""
    scale = n_src / n_dst
    src = (np.arange(n_dst) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base
    w = _cubic_weights(t)
    idx = base[:, None] + np.array([-1, 0, 1, 2])[None, :]
    return np.clip(idx, 0, n_src - 1), w


def resize_bicubic(gray: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Separable bicubic resize (real interpolation, not a
    nearest-neighbour stand-in)."""
    h, w = gray.shape
    ri, rw = _axis_taps(new_h, h)
    ci, cw = _axis_taps(new_w, w)
    src = gray.astype(np.float64)
    # rows: (new_h, w) = Σ_k rw[:,k] * src[ri[:,k], :]
    tmp = np.einsum("dk,dkw->dw", rw, src[ri, :])
    # cols: (new_h, new_w) = Σ_k cw[:,k] * tmp[:, ci[:,k]]
    out = np.einsum("dk,hdk->hd", cw, tmp[:, ci])
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def clahe_equalize(
    gray: np.ndarray, clip_limit: float = CLAHE_CLIP, grid: tuple[int, int] = CLAHE_GRID
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization — the classic
    algorithm cv2's CLAHE documents: the image is split into
    ``grid`` tiles, each tile gets a 256-bin histogram clipped at
    ``clip_limit × tile_pixels / 256`` with the excess redistributed
    uniformly, and every output pixel blends the four surrounding
    tile LUTs bilinearly (tile centers as anchors, replicate at the
    edges)."""
    h, w = gray.shape
    gy, gx = grid
    # ceil tile sizes; pad bottom/right by edge-replication like cv2
    th, tw = -(-h // gy), -(-w // gx)
    padded = np.pad(gray, ((0, th * gy - h), (0, tw * gx - w)), mode="edge")
    tiles = padded.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3)  # (gy,gx,th,tw)

    n_pix = th * tw
    limit = max(1, int(clip_limit * n_pix / 256.0))
    luts = np.empty((gy, gx, 256), np.uint8)
    for i in range(gy):
        for j in range(gx):
            hist = np.bincount(tiles[i, j].ravel(), minlength=256).astype(np.int64)
            excess = np.maximum(hist - limit, 0).sum()
            hist = np.minimum(hist, limit) + excess // 256
            # residual excess: cv2 spreads it over the first bins
            residual = int(excess % 256)
            if residual:
                hist[:residual] += 1
            cdf = np.cumsum(hist)
            luts[i, j] = np.clip(
                np.floor(cdf * (255.0 / n_pix) + 0.5), 0, 255
            ).astype(np.uint8)

    # bilinear blend between tile-center anchors
    ys = np.arange(h)
    xs = np.arange(w)
    fy = (ys + 0.5) / th - 0.5
    fx = (xs + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, gy - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, gx - 1)
    y1 = np.minimum(y0 + 1, gy - 1)
    x1 = np.minimum(x0 + 1, gx - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]

    g = gray.astype(np.int64)
    ya = y0[:, None]
    yb = y1[:, None]
    v00 = luts[ya, x0[None, :], g].astype(np.float64)
    v01 = luts[ya, x1[None, :], g].astype(np.float64)
    v10 = luts[yb, x0[None, :], g].astype(np.float64)
    v11 = luts[yb, x1[None, :], g].astype(np.float64)
    out = (
        (1 - wy) * ((1 - wx) * v00 + wx * v01)
        + wy * ((1 - wx) * v10 + wx * v11)
    )
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def nlm_denoise(
    gray: np.ndarray,
    h: float = float(NLM_PARAMS[0]),
    template: int = NLM_PARAMS[1],
    search: int = NLM_PARAMS[2],
) -> np.ndarray:
    """REAL non-local means (Buades et al. 2005), vectorized: for each
    search offset, patch SSDs come from one box-sum over the shifted
    squared difference image; weights ``exp(−SSD / (h²·|patch|))``
    accumulate a weighted average per pixel. O(search² · n) — opt-in
    (see module docstring), tested on small images."""
    img = gray.astype(np.float64)
    pad_t = template // 2
    pad_s = search // 2
    n_patch = template * template
    padded = np.pad(img, pad_s + pad_t, mode="reflect")
    base = padded[pad_s : pad_s + img.shape[0] + 2 * pad_t,
                  pad_s : pad_s + img.shape[1] + 2 * pad_t]
    acc = np.zeros_like(img)
    wsum = np.zeros_like(img)
    k = np.ones(template)
    for dy in range(-pad_s, pad_s + 1):
        for dx in range(-pad_s, pad_s + 1):
            shifted = padded[
                pad_s + dy : pad_s + dy + img.shape[0] + 2 * pad_t,
                pad_s + dx : pad_s + dx + img.shape[1] + 2 * pad_t,
            ]
            d2 = (base - shifted) ** 2
            # separable box sum over the template window
            ssd = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="valid"), 0, d2
            )
            ssd = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="valid"), 1, ssd
            )
            wgt = np.exp(-ssd / (h * h * n_patch))
            center = shifted[pad_t : pad_t + img.shape[0], pad_t : pad_t + img.shape[1]]
            acc += wgt * center
            wsum += wgt
    return np.clip(np.floor(acc / wsum + 0.5), 0, 255).astype(np.uint8)


def preprocess_image(image: np.ndarray, denoise: bool = False) -> np.ndarray:
    """``ocr_engine.py:51-82``. cv2 path is the reference verbatim
    (including NLM denoising); the numpy path runs the REAL kernels
    above — BT.601 grayscale, bicubic upscale to the exact reference
    target dims, CLAHE — and NLM only when ``denoise=True`` (cost
    note in the module docstring)."""
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
            gray = resize_bicubic(gray, new_w, new_h)
        enhanced = clahe_equalize(gray)
        if denoise:
            return nlm_denoise(enhanced)
        return enhanced
