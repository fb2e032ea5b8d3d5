"""Layout parsing — reading order over OCR region boxes (the
"PDF/layout parse" leg of the north star).

The OCR engines emit per-line regions with pixel boxes
(``engines.py`` region contract); a page's text must be assembled in
READING order, which for multi-column documents is not top-to-bottom
of the raw region list. The classic geometric recipe, implemented
here with plain arithmetic (no models — a layout model would slot
into the same actor stage and emit the same ordering):

1. COLUMN DETECTION: project region x-centers onto the x-axis, sort,
   and split where the gap between consecutive centers exceeds
   ``column_gap`` (1-D single-linkage clustering — deterministic,
   O(n log n));
2. READING ORDER: columns left-to-right, regions inside a column
   top-to-bottom (y1), ties left-to-right (x1), then the original
   index as the final deterministic tiebreak.

``order_regions`` is pure and composes with any engine; the fused
extraction stage can apply it between recognition and assembly when
a real multi-column engine replaces the synthetic one.
"""

from __future__ import annotations


def detect_columns(regions: list[dict], column_gap: float = 80.0) -> list[int]:
    """Column index per region (left-to-right), by 1-D gap clustering
    of the x-centers. Empty input → []."""
    if not regions:
        return []
    centers = sorted(
        (0.5 * (r.get("x1", 0.0) + r.get("x2", 0.0)), i)
        for i, r in enumerate(regions)
    )
    col_of = [0] * len(regions)
    col = 0
    prev_c = centers[0][0]
    for c, i in centers:
        if c - prev_c > column_gap:
            col += 1
        col_of[i] = col
        prev_c = c
    return col_of


def order_regions(regions: list[dict], column_gap: float = 80.0) -> list[dict]:
    """Regions in reading order: column → y1 → x1 → input index."""
    cols = detect_columns(regions, column_gap)
    keyed = sorted(
        range(len(regions)),
        key=lambda i: (
            cols[i],
            regions[i].get("y1", 0.0),
            regions[i].get("x1", 0.0),
            i,
        ),
    )
    return [regions[i] for i in keyed]


def reading_order_text(regions: list[dict], column_gap: float = 80.0) -> str:
    """'\\n'.join of region texts in reading order — the layout-aware
    counterpart of the engines' raw ``text`` field."""
    return "\n".join(r.get("text", "") for r in order_regions(regions, column_gap))
