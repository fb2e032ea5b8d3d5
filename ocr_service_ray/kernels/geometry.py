"""Area-coordinate geometry kernels (M17).

Reproduces the reference's 300→900-DPI area-coordinate scaling
(``/root/reference/core/processor.py:131-167``): selected-area
coordinates arrive in the DPI-300 image's pixel space and must be
scaled into the DPI-900 image's space before the hi-DPI crop. The
reference derives the scale from the ACTUAL loaded image sizes —
``high/normal`` per axis — falling back to the nominal ``900/300 =
3.0`` when a normal dimension is zero; scaled coordinates are
truncated with ``int()`` exactly as the reference does.

Pure arithmetic — no pixels needed, which is why this ports verbatim
into the sandbox. The OCR stage applies it whenever a media row
carries the optional ``normal_width/normal_height/high_width/
high_height`` dims (a real-pixel resolver would populate them from
the two loads).
"""

from __future__ import annotations


def area_scale_ratios(
    normal_width: int, normal_height: int, high_width: int, high_height: int
) -> tuple[float, float]:
    """``processor.py:139-146`` — actual-size ratio per axis, nominal
    3.0 fallback for a zero normal dimension."""
    actual_scale_x = high_width / normal_width if normal_width > 0 else 3.0
    actual_scale_y = high_height / normal_height if normal_height > 0 else 3.0
    return actual_scale_x, actual_scale_y


def scale_area(area: dict, scale_x: float, scale_y: float) -> dict:
    """``processor.py:152-163`` — int() truncation, missing keys → 0."""
    return {
        "x1": int(area.get("x1", 0) * scale_x),
        "y1": int(area.get("y1", 0) * scale_y),
        "x2": int(area.get("x2", 0) * scale_x),
        "y2": int(area.get("y2", 0) * scale_y),
    }


def scale_area_for_media(area: dict, media_row: dict) -> dict:
    """Scale an area rect using the dims carried by a media-registry
    row; identity when the row has no dims (synthetic payloads carry
    their own coordinate space)."""
    if "normal_width" not in media_row:
        return dict(area)
    sx, sy = area_scale_ratios(
        media_row.get("normal_width", 0),
        media_row.get("normal_height", 0),
        media_row.get("high_width", 0),
        media_row.get("high_height", 0),
    )
    return scale_area(area, sx, sy)
