"""Real numpy preprocess kernels (kernels/preprocess.py): the
codec-less path is no longer a stub — BT.601 grayscale is cv2's exact
fixed-point arithmetic, resize is true bicubic, CLAHE is the classic
clipped-histogram algorithm, NLM is a real (opt-in) implementation.
Each kernel is checked against an independent slow reference."""

import numpy as np
import pytest

from ocr_service_ray.kernels.preprocess import (
    bt601_gray,
    clahe_equalize,
    nlm_denoise,
    preprocess_image,
    resize_bicubic,
    upscale_dims,
)


def test_bt601_matches_fixed_point_reference():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (23, 31, 3), dtype=np.uint8)
    got = bt601_gray(img)
    # independent scalar recomputation of cv2's fixed-point formula
    for y in (0, 11, 22):
        for x in (0, 17, 30):
            b, g, r = (int(v) for v in img[y, x])
            assert got[y, x] == ((b * 1868 + g * 9617 + r * 4899 + 8192) >> 14)
    # float weights agree within 1 LSB everywhere
    f = img[:, :, 0] * 0.114 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.299
    assert np.abs(got.astype(int) - np.round(f)).max() <= 1


def test_bicubic_properties():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 256, (20, 30), dtype=np.uint8)
    # identity scale returns the source exactly (weights collapse to
    # the center tap)
    np.testing.assert_array_equal(resize_bicubic(src, 30, 20), src)
    # constant image stays constant at any scale
    const = np.full((10, 13), 77, np.uint8)
    assert (resize_bicubic(const, 40, 31) == 77).all()
    # a linear ramp is reproduced by a cubic kernel (interior pixels)
    ramp = np.tile(np.arange(0, 200, 2, dtype=np.uint8), (12, 1))
    up = resize_bicubic(ramp, 200, 24)
    interior = up[4:-4, 8:-8].astype(float)
    dif = np.diff(interior, axis=1)
    assert dif.min() >= 0  # monotone along the ramp
    # slow per-pixel reference on a tiny image, same kernel
    small = rng.randint(0, 256, (6, 7), dtype=np.uint8)
    got = resize_bicubic(small, 13, 9)

    def kernel(t, a=-0.75):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
        return 0.0

    def ref_pixel(y, x):
        sy = (y + 0.5) * 6 / 9 - 0.5
        sx = (x + 0.5) * 7 / 13 - 0.5
        by, bx = int(np.floor(sy)), int(np.floor(sx))
        acc = 0.0
        for ky in range(-1, 3):
            for kx in range(-1, 3):
                yy = min(max(by + ky, 0), 5)
                xx = min(max(bx + kx, 0), 6)
                acc += (
                    kernel(sy - (by + ky))
                    * kernel(sx - (bx + kx))
                    * float(small[yy, xx])
                )
        return int(np.clip(np.floor(acc + 0.5), 0, 255))

    for y in (0, 4, 8):
        for x in (0, 6, 12):
            assert got[y, x] == ref_pixel(y, x)


def test_clahe_properties():
    rng = np.random.RandomState(2)
    img = rng.randint(90, 110, (64, 64)).astype(np.uint8)  # low contrast
    out = clahe_equalize(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # CLAHE must STRETCH a low-contrast image
    assert int(out.max()) - int(out.min()) > int(img.max()) - int(img.min())
    # constant image: every pixel maps through an identical LUT
    const = np.full((32, 48), 33, np.uint8)
    co = clahe_equalize(const)
    assert len(np.unique(co)) == 1
    # monotone IN VALUE: when every tile has an identical histogram
    # all LUTs coincide, so output = LUT[input] and the LUT (a scaled
    # CDF) must be non-decreasing. (Spatial monotonicity is NOT a
    # CLAHE property — adjacent pixels blend different tile LUTs.)
    tile = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4).astype(np.uint8)
    same = np.tile(tile, (8, 8))  # 64×64, all 8×8 tiles identical
    so = clahe_equalize(same)
    lut_pairs = sorted(zip(same.ravel(), so.ravel()))
    vals = {}
    for v, o in lut_pairs:
        vals.setdefault(v, set()).add(o)
    assert all(len(s) == 1 for s in vals.values())  # one output per input
    outs = [next(iter(vals[v])) for v in sorted(vals)]
    assert all(b >= a for a, b in zip(outs, outs[1:]))


def test_nlm_denoises_and_preserves_edges():
    rng = np.random.RandomState(3)
    # step edge + noise; plateaus at 100/200 so the noise is never
    # clipped (a clean level of 0 clips N(0,σ) and biases the mean —
    # no denoiser can undo that)
    clean = np.full((32, 32), 100.0)
    clean[:, 16:] = 200.0
    noisy = np.clip(clean + rng.normal(0, 10, clean.shape), 0, 255).astype(np.uint8)
    out = nlm_denoise(noisy, h=25.0, template=5, search=11)
    # noise drops: residual vs clean shrinks
    before = np.abs(noisy.astype(float) - clean)[:, 2:14].mean()
    after = np.abs(out.astype(float) - clean)[:, 2:14].mean()
    assert after < before * 0.6
    # the edge survives (means of the two plateaus stay far apart)
    assert out[:, 18:].mean() - out[:, :14].mean() > 80


def test_preprocess_end_to_end_geometry_and_content():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (600, 800, 3), dtype=np.uint8)
    out = preprocess_image(img)
    w, h, _ = upscale_dims(800, 600)
    assert out.shape == (h, w) and out.dtype == np.uint8
    # the real path ENHANCES (CLAHE applied) — output is not just the
    # resized grayscale
    resized = resize_bicubic(bt601_gray(img), w, h)
    assert not np.array_equal(out, resized)
    # denoise=True branch executes — MIN_SIDE shrunk so the NLM pass
    # runs on a small upscale target instead of 1500² (30s+ in numpy)
    import ocr_service_ray.kernels.preprocess as pp

    small = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    orig = pp.MIN_SIDE
    try:
        pp.MIN_SIDE = 64
        big = preprocess_image(small, denoise=True)
    finally:
        pp.MIN_SIDE = orig
    assert big.dtype == np.uint8 and min(big.shape) >= 64
