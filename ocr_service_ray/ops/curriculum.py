"""Curriculum interleave — a deterministic training order that
stratifies every difficulty decile across the whole stream (no RNG
shuffle): rank docs by a difficulty score, cut exact deciles, and
emit position ``pos_in_decile * n_bins + decile``, so any contiguous
training window sees a near-uniform difficulty mix while easy
examples still lead inside each window group.

This is the curriculum-scheduling move of a pretraining data plan
(compose with ``ops/mix.py`` source weighting and
``ops/chunking.py`` packing), made layout-invariant the repo way:
the rank is ``ops/scan.global_rank`` (distributed sort + two-phase
block-offset scan — the one genuine all-to-all, |blocks| metadata to
the driver), and decile/position are pure integer arithmetic on the
rank — ``decile = (n_bins·r) // n``, ``pos = r − ceil(d·n / n_bins)``
— so DuckDB's ``row_number()`` reproduces every row exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["curriculum_interleave"]


def curriculum_interleave(ds, by: list[str], n_bins: int = 10):
    """Dataset ``(by..., rank, bin, out_pos)`` — ``out_pos`` is the
    curriculum order (unique: positions within a bin are distinct and
    out_pos ≡ bin mod n_bins). ``by`` must be a unique composite key
    (the ``global_rank`` contract — append the id column last)."""
    from ocr_service_ray.ops.scan import global_rank

    ranked = global_rank(ds, by)
    n = ranked.count()  # metadata-only on the materialized sort

    def assign(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (n_bins * r) // n
        start = (d * n + n_bins - 1) // n_bins  # ceil(d*n / n_bins)
        pos = r - start
        return b.append_column("bin", pa.array(d)).append_column(
            "out_pos", pa.array(pos * n_bins + d)
        )

    return ranked.map_batches(assign, batch_format="pyarrow")
