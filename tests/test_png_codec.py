"""Pure-stdlib PNG codec (kernels/png.py): spec-conformant enough
that the multimodal decode stage runs on REAL image bytes in this
codec-less sandbox. Round-trips are byte-exact; the decoder is
cross-checked against hand-filtered scanlines for every filter type."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from ocr_service_ray.kernels.png import (
    _chunk,
    _SIG,
    decode_png,
    encode_png,
    png_dims,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


@pytest.mark.parametrize(
    "shape",
    [(5, 9), (16, 16), (3, 4, 2), (7, 11, 3), (4, 6, 4), (1, 1), (2, 300, 3)],
)
def test_round_trip_exact(shape):
    arr = _rng(sum(shape)).randint(0, 256, size=shape).astype(np.uint8)
    data = encode_png(arr)
    out = decode_png(data)
    np.testing.assert_array_equal(out, arr)
    w, h = png_dims(data)
    assert (h, w) == arr.shape[:2]


def _hand_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG whose row r uses filter type filters[r], applying
    the spec's filter functions by hand — exercises decode paths the
    filter-0 encoder never emits."""
    h, w, ch = pixels.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        line = np.zeros(stride, np.int64)
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb and pa_ <= pc else (up if pb <= pc else ul)
            line[i] = (cur[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_all_filter_types_decode(ch):
    pixels = _rng(ch).randint(0, 256, size=(5, 7, ch)).astype(np.uint8)
    data = _hand_png(pixels, filters=[0, 1, 2, 3, 4])
    out = decode_png(data)
    expect = pixels[:, :, 0] if ch == 1 else pixels
    np.testing.assert_array_equal(out, expect)


def test_reject_unsupported():
    arr = np.zeros((4, 4), np.uint8)
    ok = encode_png(arr)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + ok)
    # corrupt the IHDR CRC
    bad = bytearray(ok)
    bad[29] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="dtype"):
        encode_png(arr.astype(np.uint16))
    # 16-bit depth IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data16 = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(data16)


def test_decode_stage_uses_real_png_tier():
    """DecodeImageStage without PIL must take the pure-codec tier for
    PNG payloads: dims and pixel mean match numpy ground truth (the
    fake tier could not know real dims), non-PNG still hits the
    deterministic fake."""
    from ocr_service_ray.ops.multimodal import DecodeImageStage

    g = _rng(3).randint(0, 256, size=(12, 20), dtype=np.uint8).astype(np.uint8)
    rgb = _rng(4).randint(0, 256, size=(6, 9, 3)).astype(np.uint8)
    stage = DecodeImageStage()
    batch = pa.table(
        {
            "item_id": pa.array(["g", "rgb", "txt"], pa.string()),
            "payload": pa.array(
                [encode_png(g), encode_png(rgb), b'{"not": "an image"}'],
                pa.binary(),
            ),
        }
    )
    out = stage(batch).to_pandas().set_index("item_id")
    assert int(out.loc["g", "dec_width"]) == 20
    assert int(out.loc["g", "dec_height"]) == 12
    assert int(out.loc["g", "pixel_mean_micro"]) == int(
        np.floor(g.astype(np.float64).mean() * 1e6 + 0.5)
    )
    assert int(out.loc["rgb", "dec_width"]) == 9
    assert int(out.loc["rgb", "dec_height"]) == 6
    assert int(out.loc["rgb", "pixel_mean_micro"]) == int(
        np.floor(rgb.astype(np.float64).mean() * 1e6 + 0.5)
    )
    # the non-PNG payload still produces deterministic fake features
    assert int(out.loc["txt", "dec_width"]) > 0


# ------------------------------------------------------- property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_round_trip_property(h, w, ch, seed):
    """encode ∘ decode is the identity for every 8-bit image shape."""
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    arr = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(arr))
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(2, 10),
    w=st.integers(2, 10),
    ch=st.sampled_from([1, 3]),
    filters=st.lists(st.integers(0, 4), min_size=2, max_size=10),
    seed=st.integers(0, 2**31 - 1),
)
def test_arbitrary_filter_sequences_decode(h, w, ch, filters, seed):
    """Any per-row mix of the five filter types decodes to the
    original pixels (the decoder never sees filter-0-only input from
    our encoder, so this is the real conformance surface)."""
    if len(filters) != h:
        filters = (filters * h)[:h]
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    out = decode_png(_hand_png(pixels, filters))
    expect = pixels[:, :, 0] if ch == 1 else pixels
    np.testing.assert_array_equal(out, expect)
