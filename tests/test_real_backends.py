"""Real-backend adapter tests (VERDICT r2 #9): the cv2 / PIL /
pytesseract / onnxruntime branches are import-try stubs in this
sandbox and were `# pragma: no cover` forever — these tests execute
the REAL paths in any environment that has the libraries
(``pytest.importorskip`` skips them here), plus always-run assertions
that pin the fake/real interface contract so a swapped backend cannot
drift from what downstream stages expect.
"""

import numpy as np
import pyarrow as pa
import pytest

# ------------------------------------------------------------------ contracts
# Always run: the interface every backend (fake or real) must satisfy.

ENGINE_RESULT_KEYS = {"text", "confidence", "regions", "word_count"}
REGION_KEYS = {"text", "confidence", "x1", "y1", "x2", "y2"}


def _assert_engine_result_contract(res: dict):
    assert set(res) == ENGINE_RESULT_KEYS
    assert isinstance(res["text"], str)
    assert isinstance(res["confidence"], float)
    assert isinstance(res["word_count"], int)
    for r in res["regions"]:
        assert set(r) == REGION_KEYS


def test_synthetic_engine_contract():
    import json

    from ocr_service_ray.engines import SyntheticOCR

    payload = json.dumps(
        {"lines": [["hello world", 0.9, 0.0, 0.0, 10.0, 5.0]]}
    ).encode()
    _assert_engine_result_contract(SyntheticOCR().recognize(payload))


def test_real_backends_fail_fast_without_libs():
    """In an environment WITHOUT the libs, construction must raise
    NotImplementedError in __init__ (so a misconfigured actor pool
    surfaces at spin-up, not mid-run). Skipped where the libs exist."""
    from ocr_service_ray.engines import OnnxOCR, TesseractOCR
    from ocr_service_ray.ops.multimodal import DecodeImageStage

    for lib, ctor in (
        ("pytesseract", TesseractOCR),
        ("onnxruntime", OnnxOCR),
    ):
        try:
            __import__(lib)
        except ImportError:
            with pytest.raises(NotImplementedError):
                ctor()
    try:
        import PIL  # noqa: F401
    except ImportError:
        # fake_ok=False now constructs fine (the pure-stdlib PNG tier
        # is a real decoder); only a NON-PNG payload then raises
        stage = DecodeImageStage(fake_ok=False)
        with pytest.raises(NotImplementedError):
            stage._decode(b"\xff\xd8\xff\xe0 not a png")


def test_preprocess_stub_keeps_reference_geometry():
    """The sandbox stub must land on the EXACT reference target dims
    (the part of M1 that is arithmetic, not pixels)."""
    from ocr_service_ray.kernels.preprocess import preprocess_image, upscale_dims

    img = (np.arange(300 * 200 * 3) % 251).reshape(200, 300, 3).astype(np.uint8)
    out = preprocess_image(img)
    w, h, _ = upscale_dims(300, 200)
    assert out.ndim == 2 and out.dtype == np.uint8
    assert out.shape == (h, w)
    assert min(out.shape) >= 1500


# ------------------------------------------------------------- real cv2 path


def test_preprocess_real_cv2_path():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from ocr_service_ray.kernels.preprocess import preprocess_image, upscale_dims

    img = (np.arange(240 * 320 * 3) % 251).reshape(240, 320, 3).astype(np.uint8)
    out = preprocess_image(img)
    w, h, _ = upscale_dims(320, 240)
    # same contract as the stub: 2-D uint8 at the reference target dims
    assert out.ndim == 2 and out.dtype == np.uint8
    assert out.shape == (h, w)
    # large-enough input skips the upscale entirely
    big = np.zeros((1600, 1700), dtype=np.uint8)
    assert preprocess_image(big).shape == (1600, 1700)


# ------------------------------------------------------------- real PIL path


def _png_bytes(w: int, h: int) -> bytes:
    import io

    from PIL import Image

    img = Image.new("RGB", (w, h), (120, 30, 200))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_decode_real_pil_path():
    pytest.importorskip("PIL")
    from ocr_service_ray.ops.multimodal import DecodeImageStage

    stage = DecodeImageStage(fake_ok=False)  # must NOT raise with PIL present
    batch = pa.table(
        {
            "item_id": pa.array(["a", "b"], pa.string()),
            "payload": pa.array([_png_bytes(16, 9), _png_bytes(4, 7)], pa.binary()),
        }
    )
    out = stage(batch)
    # same output schema as the fake path; real decode recovers true dims
    assert set(out.schema.names) == {
        "item_id",
        "dec_width",
        "dec_height",
        "pixel_mean_micro",
        "content_digest",
    }
    assert out["dec_width"].to_pylist() == [16, 4]
    assert out["dec_height"].to_pylist() == [9, 7]
    # constant-color image: pixel mean is exactly mean((120,30,200))
    want = int(np.floor(np.mean([120.0, 30.0, 200.0]) * 1e6 + 0.5))
    assert out["pixel_mean_micro"].to_pylist()[0] == want


def test_resize_real_pil_backend_selected():
    pytest.importorskip("PIL")
    from ocr_service_ray.ops.multimodal import ResizeImageStage

    assert ResizeImageStage()._backend == "pil"


# ------------------------------------------------------- real tesseract path


def test_tesseract_real_path():
    pytest.importorskip("pytesseract")
    pytest.importorskip("PIL")
    from ocr_service_ray.engines import TesseractOCR

    engine = TesseractOCR()  # must construct with the libs present
    try:
        res = engine.recognize(_png_bytes(64, 32))  # blank image → no text
    except Exception as e:  # tesseract BINARY may still be absent
        pytest.skip(f"tesseract binary unavailable: {e}")
    _assert_engine_result_contract(res)
    assert res["word_count"] == 0


# ------------------------------------------------------------ real onnx path


def test_onnx_real_path_constructs():
    pytest.importorskip("onnxruntime")
    from ocr_service_ray.engines import OnnxOCR

    engine = OnnxOCR()  # must construct with onnxruntime present
    # recognize without a wired model graph is documented to raise —
    # the adapter's contract is construction + session plumbing
    with pytest.raises(NotImplementedError):
        engine.recognize(b"\x00" * 16)
