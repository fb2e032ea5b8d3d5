"""Parity kernels added in round 2: M17 bbox scaling, T7 area
detection, S5 golden readers, area-OCR integration."""

import json

import numpy as np
import pyarrow as pa
import pytest


def test_area_scale_ratios_actual_and_fallback():
    """M17 — core/processor.py:139-146: actual-size ratio per axis,
    3.0 fallback on zero normal dims."""
    from ocr_service_ray.kernels.geometry import area_scale_ratios, scale_area

    sx, sy = area_scale_ratios(800, 600, 2400, 1800)
    assert (sx, sy) == (3.0, 3.0)
    sx, sy = area_scale_ratios(850, 600, 2400, 1803)
    assert sx == 2400 / 850 and sy == 1803 / 600
    assert area_scale_ratios(0, 0, 2400, 1800) == (3.0, 3.0)

    # int() truncation exactly as processor.py:152-163
    scaled = scale_area({"x1": 10, "y1": 20, "x2": 101, "y2": 333}, 2400 / 850, 3.0)
    assert scaled == {
        "x1": int(10 * 2400 / 850),
        "y1": 60,
        "x2": int(101 * 2400 / 850),
        "y2": 999,
    }
    # missing keys default to 0 (reference .get(..., 0))
    assert scale_area({}, 3.0, 3.0) == {"x1": 0, "y1": 0, "x2": 0, "y2": 0}


def test_area_detector_boxes_and_fallback():
    """T7 — area_detector.py:36-84: Otsu + contour boxes with the
    w>50/h>50 filter; empty → full_document."""
    from ocr_service_ray.kernels.area_detect import AreaDetector

    img = np.zeros((300, 400), dtype=np.uint8)
    img[20:100, 30:180] = 220       # 150x80 block → kept
    img[150:260, 200:320] = 200     # 120x110 block → kept
    img[10:15, 350:360] = 255       # tiny blob → filtered (w,h <= 50)
    areas = AreaDetector().detect_areas(img)
    assert {a["type"] for a in areas} == {"text_block"}
    assert len(areas) == 2
    boxes = sorted((a["x1"], a["y1"], a["x2"], a["y2"]) for a in areas)
    assert boxes == [(30, 20, 180, 100), (200, 150, 320, 260)]

    blank = np.zeros((120, 90), dtype=np.uint8)
    fallback = AreaDetector().detect_areas(blank)
    assert fallback == [{"x1": 0, "y1": 0, "x2": 90, "y2": 120, "type": "full_document"}]


def test_otsu_threshold_bimodal():
    from ocr_service_ray.kernels.area_detect import otsu_threshold

    gray = np.concatenate(
        [np.full(500, 30, dtype=np.uint8), np.full(500, 200, dtype=np.uint8)]
    ).reshape(20, 50)
    t = otsu_threshold(gray)
    assert 30 <= t < 200  # separates the two modes


def test_golden_readers(tmp_path):
    """S5 — dataset_loader.py:95-152: .txt read, name normalization,
    unreadable formats → "" with the reference's warning semantics."""
    from ocr_service_ray.sources.golden import (
        load_golden_table,
        load_reference_text,
        normalize_golden_name,
    )

    assert normalize_golden_name("1 АОСР") == "АОСР"
    assert normalize_golden_name("АОСР копия") == "АОСР копия"

    (tmp_path / "1 акт.txt").write_text("Текст акта", encoding="utf-8")
    (tmp_path / "2 форма.docx").write_bytes(b"not really docx")
    (tmp_path / "протокол.xlsx").write_bytes(b"not really xlsx")
    (tmp_path / "ignored.png").write_bytes(b"")

    assert load_reference_text(str(tmp_path / "1 акт.txt")) == "Текст акта"
    with pytest.warns(UserWarning):
        assert load_reference_text(str(tmp_path / "2 форма.docx")) == ""

    with pytest.warns(UserWarning):
        t = load_golden_table(str(tmp_path))
    rows = {r["name"]: r["golden_text"] for r in t.to_pylist()}
    assert rows == {"акт": "Текст акта", "форма": "", "протокол": ""}


def test_area_ocr_scaled_rect():
    """M3+M17 integration: an area span with a DPI-300 rect OCRs only
    the lines inside the hi-DPI-scaled rect."""
    from ocr_service_ray.engines import SyntheticOCR
    from ocr_service_ray.oracle import extract_spans

    lines = [
        ["внутри области", 0.9, 100.0, 100.0, 400.0, 130.0],
        ["вне области", 0.8, 2000.0, 2000.0, 2300.0, 2030.0],
    ]
    media = {
        "m-a-0": {
            "media_ref": "m-a-0",
            "payload": json.dumps({"lines": lines}, ensure_ascii=False).encode(),
            "sharpness_var": 100.0,
            "contrast_std": 50.0,
            "brightness_mean": 127.5,
            # DPI-300 frame is 500x500, hi-DPI is 1500x1500 → scale 3.0
            "normal_width": 500,
            "normal_height": 500,
            "high_width": 1500,
            "high_height": 1500,
            # rect in DPI-300 space: (20,20)-(160,60) → scaled (60,60)-(480,180)
            "area_rect": {"x1": 20, "y1": 20, "x2": 160, "y2": 60},
        }
    }
    doc = {
        "doc_id": "a",
        "spans": [{"kind": "area", "text": "", "media_ref": "m-a-0", "offset": 0}],
    }
    extracted, _, _ = extract_spans(doc, media, SyntheticOCR())
    assert extracted[0]["text"] == "внутри области"
    assert extracted[0]["confidence"] == 0.9


def test_preprocess_upscale_dims():
    """M1 — ocr_engine.py:67-73 min-side-1500 rule, verbatim."""
    from ocr_service_ray.kernels.preprocess import preprocess_image, upscale_dims

    # both sides small → scale by the larger deficit
    w, h, s = upscale_dims(800, 600)
    assert s == max(1500 / 600, 1500 / 800) == 2.5
    assert (w, h) == (int(800 * 2.5), int(600 * 2.5)) == (2000, 1500)
    # one side large enough, the other not → still upscales
    w, h, s = upscale_dims(3000, 1000)
    assert s == 1.5 and (w, h) == (4500, 1500)
    # both ≥ 1500 → untouched
    assert upscale_dims(1500, 1600) == (1500, 1600, 1.0)

    img = np.random.RandomState(0).randint(0, 255, (600, 800, 3), dtype=np.uint8)
    out = preprocess_image(img)
    assert out.shape == (1500, 2000)  # (h, w) of the reference target
    assert out.dtype == np.uint8


def test_html_boilerplate_strip():
    """North-star DOM heuristic: block-level text-density scoring must
    drop nav/ads/related/footer/script and keep multi-paragraph prose
    (inline links below the density threshold included)."""
    from ocr_service_ray.ops.html import extract_main_content, synthesize_page

    art = "plenty of genuine article prose to keep the block above threshold"
    page = synthesize_page(42, art)
    assert extract_main_content(page) == art

    messy = (
        "<html><body>"
        "<nav><a href=/>Home</a> <a href=/n>News</a> <a href=/m>More</a></nav>"
        "<div><h1>A headline long enough to count as content here</h1>"
        "<p>First paragraph of the article with plenty of prose inside.</p>"
        "<p>Second paragraph, long enough, with an inline "
        "<a href=/r>reference link</a> that must not disqualify it.</p></div>"
        "<aside><ul><li><a href=/1>Related story with long anchor text</a></li>"
        "<li><a href=/2>Another related story with long anchor</a></li></ul></aside>"
        "<script>var x = 'never appears in the output at all';</script>"
        "<footer><a href=/about>About us</a> © 2026</footer></body></html>"
    )
    out = extract_main_content(messy)
    assert "never appears" not in out and "Related story" not in out
    assert "Home" not in out and "About us" not in out
    assert "First paragraph" in out and "Second paragraph" in out
    assert "headline long enough" in out
    # link-density boundary: a long link-only block is dropped even
    # though it passes the length gate
    linky = "<div><a href=x>" + "all of this text is one giant link " * 3 + "</a></div>"
    assert extract_main_content(linky) == ""


def test_layout_reading_order_two_columns():
    """Layout parse: a two-column page must read left column fully,
    then right column — not raw top-to-bottom interleaving."""
    from ocr_service_ray.kernels.layout import (
        detect_columns,
        order_regions,
        reading_order_text,
    )

    def box(text, x1, y1, w=180.0, h=20.0):
        return {"text": text, "x1": x1, "y1": y1, "x2": x1 + w, "y2": y1 + h}

    # interleaved input order (as an OCR engine might emit by y)
    regions = [
        box("L1", 50, 10), box("R1", 400, 12),
        box("L2", 52, 40), box("R2", 402, 44),
        box("L3", 51, 70), box("R3", 401, 75),
    ]
    cols = detect_columns(regions)
    assert cols == [0, 1, 0, 1, 0, 1]
    assert reading_order_text(regions) == "L1\nL2\nL3\nR1\nR2\nR3"

    # single column: y-order with x tiebreak
    single = [box("b", 10, 50), box("a", 10, 10), box("a2", 300, 10, w=50)]
    assert [r["text"] for r in order_regions(single, column_gap=500)] == ["a", "a2", "b"]

    # deterministic on exact ties (input index tiebreak)
    ties = [box("t1", 10, 10), box("t2", 10, 10)]
    assert [r["text"] for r in order_regions(ties)] == ["t1", "t2"]
    assert order_regions([]) == [] and detect_columns([]) == []


def test_resolve_latest_model_mtime(tmp_path):
    """O7 — latest-by-mtime checkpoint resolution
    (ref core/processor.py:476-485): newest glob match wins, empty
    glob -> None, explicit version short-circuits the scan."""
    import os

    from ocr_service_ray.stages.ml import resolve_latest_model

    assert resolve_latest_model(tmp_path) is None

    old = tmp_path / "best_model_epoch_3.pth"
    new = tmp_path / "best_model_epoch_1.pth"  # epoch number is NOT the key
    other = tmp_path / "final_model.pth"
    for p in (old, new, other):
        p.write_bytes(b"x")
    os.utime(old, (1_000_000, 1_000_000))
    os.utime(new, (2_000_000, 2_000_000))
    os.utime(other, (3_000_000, 3_000_000))  # newest overall but wrong pattern

    assert resolve_latest_model(tmp_path) == new
    assert resolve_latest_model(tmp_path, explicit=str(old)).name == old.name
