"""Pure-stdlib PNG codec (zlib + struct + numpy) — a REAL image
codec for the multimodal decode path.

The sandbox has no PIL/cv2, so image decode was a clearly-marked
deterministic fake (``ops/multimodal.py``). PNG, however, needs
nothing beyond the standard library: the format is zlib-compressed
filtered scanlines in CRC-framed chunks (PNG spec, RFC 2083 /
ISO 15948). This module implements the spec subset that covers
8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced — enough
that the decode stage can run on genuine image bytes end-to-end,
in-sandbox, with byte-exact round-trip tests.

Decoder: all five filter types (None / Sub / Up / Average / Paeth).
Up is fully vectorized; Sub reduces to a per-channel cumulative sum
(uint8 wraparound == mod-256 arithmetic); Average and Paeth carry a
left-pixel dependency and run as a per-row loop — fine for the
sandbox's small test images, and the loop is per SCANLINE, never per
image batch. Encoder: filter-0 scanlines (valid PNG; compression
ratio is not the point here).

Unsupported (explicit ValueError): bit depths other than 8, palette
images, interlacing — the error names the field so a real corpus'
exotic file fails loudly instead of decoding garbage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples/pixel


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an 8-bit array as a valid PNG.

    Shapes: (h, w) → greyscale; (h, w, 2) → grey+alpha; (h, w, 3) →
    RGB; (h, w, 4) → RGBA.
    """
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png: dtype must be uint8, got {a.dtype}")
    if a.ndim == 2:
        colortype = 0
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        colortype = {2: 4, 3: 2, 4: 6}[a.shape[2]]
    else:
        raise ValueError(f"encode_png: unsupported shape {arr.shape}")
    h, w, _ = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), a.reshape(h, -1)], axis=1
    ).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a uint8 array: (h, w) for greyscale, else
    (h, w, channels)."""
    if data[:8] != _SIG:
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"decode_png: CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("decode_png: missing IHDR")
    w, h, depth, colortype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"decode_png: unsupported bit depth {depth} (only 8)")
    if colortype not in _CHANNELS:
        raise ValueError(
            f"decode_png: unsupported color type {colortype} (palette?)"
        )
    if interlace:
        raise ValueError("decode_png: interlaced PNGs unsupported")
    ch = _CHANNELS[colortype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_png: IDAT length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), np.uint16)  # widened for filter math
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        f = int(filters[y])
        line = rows[y, 1:].astype(np.uint16)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub — per-channel cumulative sum mod 256
            rec = line.copy()
            for c in range(ch):
                rec[c::ch] = np.cumsum(line[c::ch]) & 0xFF
        elif f == 2:  # Up — fully vectorized
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average — left dependency, per-sample loop
            rec = line.copy()
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for i in range(stride):
                left = int(rec[i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                rec[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"decode_png: unknown filter type {f}")
        out[y] = rec
        prev = out[y]
    img = out.astype(np.uint8).reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def png_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without decompressing pixels —
    the metadata-only fast path for schema/layout stages."""
    if data[:8] != _SIG or data[12:16] != b"IHDR":
        raise ValueError("png_dims: not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return int(w), int(h)
