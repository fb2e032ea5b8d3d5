"""Reading-order reconstruction from span geometry — the layout-parse
step of a PDF/scan extraction pipeline (the XY-cut family, reduced to
its deterministic 1-D core): cluster spans into COLUMNS by x-gap,
then read column-major, top-to-bottom.

Reference anchor: the reference service processes OCR areas in
y-then-x box order implicitly (reference ``core/processor.py``
area loop) and never reconstructs multi-column order; this op is the
generalization a layout-aware corpus pipeline needs (two-column
papers, receipts beside stamps). Real box coordinates come from the
PDF/OCR decode stage, which is stubbed in this sandbox (the
multimodal contract) — the op takes integer geometry columns and is
exercised on deterministic synthetic boxes.

Semantics (integer-exact, SQL-reproducible):

- per page, the DISTINCT x positions are sorted; a new column starts
  wherever the gap to the previous distinct x exceeds
  ``gap_threshold`` (strictly greater). ``column_id`` is the running
  split count (0-based, left to right);
- reading order sorts by ``(column_id, y, x, span_id)`` (span_id is
  the total tie-break) and numbers from 0.

100 TB shape: ONE bucketed page-key shuffle
(``ops/agg.bucketed_map_groups``); per-page work is a numpy sort +
diff over that page's spans only. No global sort — pages are
independent, which is exactly why page is the partitioning key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["reading_order"]


def reading_order(
    ds,
    page_col: str = "page_id",
    span_col: str = "span_id",
    x_col: str = "x",
    y_col: str = "y",
    gap_threshold: int = 100,
):
    """Dataset ``(page_id, span_id, column_id, read_order)`` — one row
    per input span; ``read_order`` is 0-based within its page."""
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def per_page(g: pd.DataFrame) -> pd.DataFrame:
        x = g[x_col].to_numpy(dtype=np.int64)
        ux = np.unique(x)  # sorted distinct x
        splits = np.zeros(len(ux), dtype=np.int64)
        if len(ux) > 1:
            splits[1:] = (np.diff(ux) > gap_threshold).astype(np.int64)
        col_of = dict(zip(ux, np.cumsum(splits)))
        cols = np.array([col_of[v] for v in x], dtype=np.int64)
        out = pd.DataFrame(
            {
                page_col: g[page_col].to_numpy(),
                span_col: g[span_col].to_numpy(dtype=np.int64),
                "column_id": cols,
                "y": g[y_col].to_numpy(dtype=np.int64),
                "x": x,
            }
        ).sort_values(["column_id", "y", "x", span_col])
        out["read_order"] = np.arange(len(out), dtype=np.int64)
        return out[[page_col, span_col, "column_id", "read_order"]]

    return bucketed_map_groups(ds, [page_col], per_page)
