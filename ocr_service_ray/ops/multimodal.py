"""Multimodal binary-column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages with SMALL batch sizes (wide rows).
The actual codec libraries (PIL/cv2/ffmpeg) are not in this sandbox —
per the build contract the decode step is STUBBED behind an
import-try with a clearly-marked deterministic fake, while the
Ray-side plumbing (schema, batch size, actor signature, output
layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # image | audio | video
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class DecodeImageStage:
    """Actor stage: binary payload → per-image features.

    THREE decode tiers, best available per payload:

    - PIL present: any format PIL reads → (width, height, pixel mean).
    - PNG payload (magic-sniffed): the pure-stdlib codec in
      ``kernels/png.py`` — a REAL spec decode (zlib inflate + scanline
      unfiltering), executable in this sandbox and byte-round-trip
      tested, so genuine image bytes exercise the stage end-to-end
      without PIL.
    - anything else without PIL: the DETERMINISTIC FAKE — features
      derived from the payload bytes, keeping schema / batching /
      determinism testable for non-PNG media. ``fake_ok=False``
      disables the fake: non-PNG payloads then raise instead of
      producing stand-in features.
    """

    def __init__(self, fake_ok: bool = True):
        self.fake_ok = fake_ok
        try:
            from PIL import Image  # noqa: F401

            self._decode = self._decode_real
        except ImportError:
            self._decode = self._decode_auto

    def _decode_auto(self, payload: bytes) -> tuple[int, int, float]:
        if payload[:8] == _PNG_SIG:
            return self._decode_png(payload)
        if not self.fake_ok:
            raise NotImplementedError(
                "non-PNG image decode requires PIL; pass fake_ok=True for "
                "the deterministic stub"
            )
        return self._decode_fake(payload)

    @staticmethod
    def _decode_png(payload: bytes) -> tuple[int, int, float]:
        from ocr_service_ray.kernels.png import decode_png

        arr = decode_png(payload)
        h, w = arr.shape[:2]
        return int(w), int(h), float(arr.astype(np.float64).mean())

    @staticmethod
    def _decode_real(payload: bytes) -> tuple[int, int, float]:  # pragma: no cover
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img, dtype=np.float64)
        return img.width, img.height, float(arr.mean())

    @staticmethod
    def _decode_fake(payload: bytes) -> tuple[int, int, float]:
        # DETERMINISTIC FAKE: stands in for pixel decode in this
        # sandbox. Oracle discipline: integer byte stats + one double
        # division — the exact expressions DuckDB reproduces from a
        # text-derived payload (see __ray_entry__ multimodal oracles).
        buf = np.frombuffer(payload, dtype=np.uint8)
        w = int(buf[:4].sum()) + 1 if len(buf) >= 4 else 1
        h = max(1, len(buf) // max(w, 1))
        mean = int(buf.sum()) / len(buf) if len(buf) else 0.0
        return w, h, mean

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, micros, digests = [], [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, mean = self._decode(payload)
            widths.append(w)
            heights.append(h)
            micros.append(int(np.floor(mean * 1000000.0 + 0.5)))
            # md5 so DuckDB's md5() reproduces the digest
            digests.append(hashlib.md5(payload).hexdigest())
        return (
            batch.drop_columns(["payload"])  # decoded payloads don't cross blocks
            .append_column("dec_width", pa.array(widths, pa.int32()))
            .append_column("dec_height", pa.array(heights, pa.int32()))
            .append_column("pixel_mean_micro", pa.array(micros, pa.int64()))
            .append_column("content_digest", pa.array(digests, pa.string()))
        )


class FrameSampleStage:
    """Actor stage: video payload → every-nth-"frame" sample refs.

    Sandbox stub: frames are fixed-size byte windows of the payload
    (deterministic); real adapter would use ffmpeg/cv2. Emits one row
    per sampled frame (flat_map-shaped explode done batch-wise)."""

    def __init__(self, every_n: int = 10, frame_bytes: int = 256):
        self.every_n = every_n
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, digests = [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(), batch["payload"].to_pylist()):
            n_frames = max(1, len(payload) // self.frame_bytes)
            for f in range(0, n_frames, self.every_n):
                chunk = payload[f * self.frame_bytes : (f + 1) * self.frame_bytes]
                ids.append(item_id)
                frame_idx.append(f)
                # md5[:16] so DuckDB reproduces the frame digest
                digests.append(hashlib.md5(chunk).hexdigest()[:16])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame_digest": pa.array(digests, pa.string()),
            }
        )


class ResizeImageStage:
    """Actor stage: aspect-preserving resize metadata + payload
    transform. Sandbox stub: the OUTPUT payload is a deterministic
    byte-subsample of the input (real adapter: PIL ``Image.resize`` +
    re-encode); target-dimension arithmetic (the reference's min-side
    ≥1500 upscale rule inverted to a max-side cap) is real and
    identical on both paths — that is what downstream stages size
    batches by."""

    def __init__(self, max_side: int = 512):
        self.max_side = max_side
        try:
            from PIL import Image  # noqa: F401

            self._backend = "pil"  # pragma: no cover
        except ImportError:
            self._backend = "fake-subsample"

    def _target_dims(self, w: int, h: int) -> tuple[int, int]:
        side = max(w, h)
        if side <= self.max_side:
            return w, h
        scale = self.max_side / side
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, batch: pa.Table) -> pa.Table:
        new_w, new_h, payloads = [], [], []
        for w, h, payload in zip(
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            tw, th = self._target_dims(w, h)
            new_w.append(tw)
            new_h.append(th)
            if (tw, th) == (w, h):
                payloads.append(payload)
            else:
                # FAKE resize: keep every k-th byte (deterministic)
                k = max(1, (w * h) // max(1, tw * th))
                payloads.append(payload[::k])
        return (
            batch.drop_columns(["payload", "width", "height"])
            .append_column("width", pa.array(new_w, pa.int32()))
            .append_column("height", pa.array(new_h, pa.int32()))
            .append_column("payload", pa.array(payloads, pa.binary()))
        )


class AudioFeatureStage:
    """Actor stage: audio payload → windowed features (RMS + peak per
    window). Sandbox stub interprets the payload bytes as int8 samples
    (real adapter: soundfile/librosa decode); the windowing, vectorized
    numpy feature math and one-row-per-window explode are real.

    Oracle discipline: the squared-sample sum is an exact integer (all
    intermediates < 2^53, so any float summation order is exact), then
    one double division + sqrt — the identical SQL expression."""

    def __init__(self, window: int = 1024):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, win_idx, rms_micro, peak = [], [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            samples = np.frombuffer(payload, dtype=np.int8).astype(np.int64)
            n_win = max(1, len(samples) // self.window)
            for w in range(n_win):
                chunk = samples[w * self.window : (w + 1) * self.window]
                if not len(chunk):
                    chunk = np.zeros(1, dtype=np.int64)
                ids.append(item_id)
                win_idx.append(w)
                rms = np.sqrt(int((chunk * chunk).sum()) / len(chunk))
                rms_micro.append(int(np.floor(rms * 1000000.0 + 0.5)))
                peak.append(int(chunk.max()))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.string()),
                "window_idx": pa.array(win_idx, pa.int32()),
                "rms_micro": pa.array(rms_micro, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
            }
        )


def synthesize_media_items(n: int, seed: int = 42) -> pa.Table:
    """Deterministic binary-column fixture (no external data)."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(f"{seed}:mm:{i}")
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(64, 4096)))
        rows.append(
            {
                "item_id": f"item-{i:06d}",
                "payload": payload,
                "media_type": rng.choice(["image", "audio", "video"]),
                "width": rng.randint(16, 1024),
                "height": rng.randint(16, 1024),
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_META)


def derive_media_items(docs_ds, repeat: int = 8):
    """Deterministic media-item table derived from the ``documents``
    table (doc_id, text): payload = utf-8 bytes of the text repeated
    ``repeat``× (ASCII corpus → SQL char ops ARE byte ops), media_type
    round-robins by doc_id. Makes every multimodal stage output
    re-derivable by the DuckDB oracle from the same registered view —
    no side-channel fixture."""

    def to_items(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        kinds = ["image", "audio", "video"]
        return pa.table(
            {
                "item_id": pa.array([f"item-{i:08d}" for i in ids], pa.string()),
                "payload": pa.array([(t * repeat).encode() for t in texts], pa.binary()),
                "media_type": pa.array([kinds[i % 3] for i in ids], pa.string()),
                "width": pa.array((16 + ids % 1009).astype(np.int32)),
                "height": pa.array((16 + ids % 997).astype(np.int32)),
            }
        )

    return docs_ds.map_batches(to_items, batch_format="pyarrow")


def decode_pipeline(ds, batch_size: int = 16, concurrency=(1, 4)):
    """The canonical multimodal stage wiring: small batches (wide
    binary rows), actor pool, decoded payload never crosses blocks."""
    return ds.map_batches(
        DecodeImageStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class RouteMediaStage:
    """Single-pass type router: ONE actor holds all per-type
    sub-stages and splits each batch by ``media_type`` internally —
    images → resize → decode features, audio → windowed features,
    video → frame samples. The alternative (three filtered sub-plans
    over the same source) reads the source THREE times on a real
    ``read_parquet`` input, because a ``map_batches`` filter does not
    push down — at 100 TB that is 3× the scan bytes."""

    def __init__(self):
        self.resize = ResizeImageStage()
        self.decode = DecodeImageStage()
        self.audio = AudioFeatureStage()
        self.frames = FrameSampleStage()

    @staticmethod
    def _tag(t: pa.Table, kind: str) -> pa.Table:
        return t.select(["item_id"]).append_column(
            "feature", pa.array([kind] * t.num_rows, pa.string())
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = [
            pa.table(
                {"item_id": pa.array([], pa.string()), "feature": pa.array([], pa.string())}
            )
        ]
        img = batch.filter(pc.equal(batch["media_type"], "image"))
        if img.num_rows:
            outs.append(self._tag(self.decode(self.resize(img)), "image"))
        aud = batch.filter(pc.equal(batch["media_type"], "audio"))
        if aud.num_rows:
            outs.append(self._tag(self.audio(aud), "audio"))
        vid = batch.filter(pc.equal(batch["media_type"], "video"))
        if vid.num_rows:
            outs.append(self._tag(self.frames(vid), "video"))
        return pa.concat_tables(outs)


def media_pipeline(ds, batch_size: int = 16, concurrency=(1, 4)):
    """Type-routed multimodal plan: ONE scan of the source, routed by
    ``media_type`` inside a single actor-pool stage (RouteMediaStage).
    Output schema: {item_id, feature} — the union of the per-type
    feature tags (per-type detail columns live in the dedicated
    single-type pipelines)."""
    return ds.map_batches(
        RouteMediaStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
