"""Feedback aggregation jobs — the reference's active-learning loop as
deterministic batch pipelines.

The reference mutates a shared corrections DB mid-run
(``/root/reference/core/correctors.py:295-307``,
``services/active_learning.py:91-124``) — a race it ignores. The
rebuild freezes the DB per run (epoch semantics, SURVEY.md §2.9):
feedback is an append-only sink table; these jobs aggregate it offline
and emit the NEXT corrections epoch.

Jobs:
- :func:`consensus_suggestions` — aggregation A2
  (``core/processor.py:415-460``): low-confidence corrections from
  docs needing review, grouped by source token; groups whose proposed
  fixes all agree become suggestions at confidence 0.7.
- :func:`promote_corrections` — aggregation A3
  (``services/feedback_collector.py:185-234``): unapplied feedback
  grouped by (original, corrected); keep groups with ≥2 occurrences
  and mean confidence ≥0.7 (thresholds from
  ``services/active_learning.py:31-32``), sorted by (occurrences,
  avg_confidence) descending.
- :func:`top_error_patterns` — aggregation A4
  (``services/active_learning.py:126-195``): the canonical top-k —
  groupby + count + sort desc + limit.
- :func:`next_epoch` — promoted pairs anti-joined against the current
  DB's keys (D4, ``services/active_learning.py:110``) and appended in
  deterministic order.

All shuffles here key on (original, corrected) / from-token — small
distinct domains; partial aggregation inside map_batches happens for
free via Ray Data's partial+final aggregate implementation.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def explode_low_confidence_corrections(out_ds, max_confidence: float = 0.8):
    """OUT_SCHEMA dataset → one row per applied correction with
    confidence < ``max_confidence`` from documents needing review
    (``core/processor.py:419-427``).

    Note: with the reference's default settings this filter is
    vacuous — every correction method emits confidence ≥ 0.8 (exact
    1.0, contextual 0.95, fuzzy ≥ SIMILARITY_THRESHOLD = 0.8) — so the
    reference's consensus path never collects anything. The cutoff is
    kept at 0.8 for parity and exposed as a parameter so the logic is
    actually exercisable (and tested) at other thresholds."""

    def explode(batch: pa.Table) -> pa.Table:
        froms, tos, confs = [], [], []
        review = batch["needs_review"].to_pylist()
        corr = batch["corrections_applied"].to_pylist()
        for needs, corrections in zip(review, corr):
            if not needs:
                continue
            for c in corrections:
                if c["confidence"] < max_confidence:
                    froms.append(c["from_"])
                    tos.append(c["to"])
                    confs.append(c["confidence"])
        return pa.table(
            {"from_": froms, "to": tos, "confidence": confs},
            schema=pa.schema(
                [("from_", pa.string()), ("to", pa.string()), ("confidence", pa.float64())]
            ),
        )

    return out_ds.map_batches(explode, batch_format="pyarrow")


def consensus_suggestions(out_ds, max_confidence: float = 0.8):
    """A2: per source token, suggest iff every observed fix agrees
    (``core/processor.py:440-460``). Returns a Dataset of
    {from_, to, confidence, occurrences}."""
    exploded = explode_low_confidence_corrections(out_ds, max_confidence)

    def consensus(group: pd.DataFrame) -> pd.DataFrame:
        if group["to"].nunique() == 1:
            return pd.DataFrame(
                {
                    "from_": [group["from_"].iloc[0]],
                    "to": [group["to"].iloc[0]],
                    "confidence": [0.7],
                    "occurrences": [len(group)],
                }
            )
        return pd.DataFrame(columns=["from_", "to", "confidence", "occurrences"])

    return exploded.groupby("from_").map_groups(consensus, batch_format="pandas")


def promote_corrections(feedback_ds, min_occurrences: int = 2, min_confidence: float = 0.7):
    """A3: the one true grouped aggregate of the system. Returns a
    Dataset of {original, corrected, occurrences, avg_confidence}
    sorted by (occurrences, avg_confidence) desc."""
    from ocr_service_ray.ops.agg import grouped_agg

    unapplied = feedback_ds.map_batches(
        lambda t: t.filter(
            pa.compute.and_(
                pa.compute.invert(t["applied"].combine_chunks()),
                pa.compute.equal(t["type"].combine_chunks(), "correction"),
            )
        ),
        batch_format="pyarrow",
    )
    # combiner-style aggregate (ops/agg.py): feedback tables grow with
    # usage — the shuffle moves per-block partials, not events
    agg = grouped_agg(
        unapplied.select_columns(["original", "corrected", "confidence"]),
        ["original", "corrected"],
        {
            "occurrences": ("confidence", "count"),
            "avg_confidence": ("confidence", "mean"),
        },
    )
    agg = agg.map_batches(
        lambda t: t.filter(
            pa.compute.and_(
                pa.compute.greater_equal(
                    t["occurrences"].combine_chunks(), min_occurrences
                ),
                pa.compute.greater_equal(
                    t["avg_confidence"].combine_chunks(), min_confidence
                ),
            )
        ),
        batch_format="pyarrow",
    )
    return agg.sort(["occurrences", "avg_confidence"], descending=[True, True])


def top_error_patterns(feedback_ds, k: int = 10):
    """A4: most_common(k) over unapplied (original, corrected) pairs
    (``services/active_learning.py:154``). Deterministic tie-break on
    the pair itself."""
    from ocr_service_ray.ops.agg import grouped_agg

    unapplied = feedback_ds.map_batches(
        lambda t: t.filter(pa.compute.invert(t["applied"].combine_chunks())),
        batch_format="pyarrow",
    )
    return (
        grouped_agg(
            unapplied.select_columns(["original", "corrected"]),
            ["original", "corrected"],
            {"occurrences": (None, "count")},
        )
        .sort(
            ["occurrences", "original", "corrected"],
            descending=[True, False, False],
        )
        .limit(k)
    )


def next_epoch(current_entries: list[tuple[str, str]], promoted) -> list[tuple[str, str]]:
    """Build the next corrections-DB epoch: promoted pairs not already
    keyed in the DB (anti-join against the broadcast key set — D4),
    appended in the promotion sort order. ``promoted`` is the (small)
    result Dataset of :func:`promote_corrections`."""
    existing = {k for k, _ in current_entries}
    out = list(current_entries)
    for row in promoted.take_all():  # promotion results are tiny by construction
        if row["original"] not in existing:
            out.append((row["original"], row["corrected"]))
            existing.add(row["original"])
    return out
