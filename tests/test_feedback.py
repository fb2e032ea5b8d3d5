"""Feedback aggregation jobs (A2/A3/A4) against the planted fixture
(FIXTURES.md §5)."""

import pytest

from ocr_service_ray.pipelines.feedback import (
    consensus_suggestions,
    next_epoch,
    promote_corrections,
    top_error_patterns,
)
from ocr_service_ray.sources.synth import corrections_entries, generate_feedback


@pytest.fixture(scope="module")
def feedback_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(generate_feedback())


def test_promote_corrections(feedback_ds):
    got = promote_corrections(feedback_ds).to_pandas()
    # Only the 3×@0.9 pair passes both gates; 2×@0.5 fails confidence,
    # 1×@1.0 fails occurrences, applied pair is excluded.
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["original"], row["corrected"]) == ("сертефикат", "сертификат")
    assert row["occurrences"] == 3
    assert row["avg_confidence"] == pytest.approx(0.9)


def test_top_error_patterns(feedback_ds):
    got = top_error_patterns(feedback_ds, k=2).to_pandas()
    assert list(got["original"]) == ["сертефикат", "арганизация"]
    assert list(got["occurrences"]) == [3, 2]


def test_next_epoch_anti_join(feedback_ds):
    promoted = promote_corrections(feedback_ds)
    entries = corrections_entries()
    epoch2 = next_epoch(entries, promoted)
    # "сертефикат" is already a DB key → nothing new appended.
    assert epoch2 == entries

    epoch_from_empty = next_epoch([("x", "y")], promoted)
    assert epoch_from_empty == [("x", "y"), ("сертефикат", "сертификат")]


def test_consensus_suggestions(ray_session, small_corpus):
    """A2 over real pipeline output: every suggestion's source group
    must have agreed on one fix; occurrences counted."""
    from ocr_service_ray.pipelines.flagship import run_extraction
    from ocr_service_ray.sources.synth import corrections_entries as ce

    docs, media = small_corpus

    # At the reference's default cutoff (0.8) the filter is vacuous —
    # every method emits confidence >= 0.8 (see feedback.py docstring).
    out = run_extraction(docs.slice(0, 80), media, ce())
    assert consensus_suggestions(out).count() == 0

    # At a higher cutoff the consensus logic is exercised: contextual
    # (0.95) and fuzzy (~0.8-0.93) corrections flow in.
    out2 = run_extraction(docs.slice(0, 80), media, ce())
    got = consensus_suggestions(out2, max_confidence=0.96).to_pandas()
    assert len(got) > 0
    assert (got["confidence"] == 0.7).all()
    assert (got["occurrences"] >= 1).all()
    # Consensus rule: a from-token maps to exactly one suggested fix.
    assert got["from_"].is_unique


def test_phase3_full_loop(ray_session):
    """The reference's phase-3 flow (scripts/test_phase3.py:26-179):
    process → collect feedback → promote → next corrections epoch →
    REPROCESS with the new DB and observe the behavioral change. The
    rebuild's epoch semantics make the loop explicit: the DB is frozen
    within a run; promotion produces the next epoch's artifact."""
    import pyarrow as pa

    from ocr_service_ray import schema
    from ocr_service_ray.pipelines.feedback import next_epoch, promote_corrections
    from ocr_service_ray.pipelines.flagship import run_extraction
    from ocr_service_ray.sources.synth import corrections_entries

    import ray.data as rd

    docs = pa.Table.from_pydict(
        {
            "doc_id": ["loop-0"],
            "spans": [[{"kind": "text", "text": "Привет Масква 123", "media_ref": "", "offset": 0}]],
        },
        schema=schema.DOC_SCHEMA,
    )

    epoch1 = corrections_entries()
    out1 = run_extraction(docs, {}, epoch1).take_all()[0]
    assert "Масква" in out1["full_text"]  # epoch 1: token not corrected

    # users file feedback: same fix observed twice, high confidence
    feedback = pa.table(
        {
            "original": ["Масква", "Масква"],
            "corrected": ["Москва", "Москва"],
            "confidence": [0.9, 0.85],
            "applied": [False, False],
            "type": ["correction", "correction"],
        }
    )
    promoted = promote_corrections(rd.from_arrow(feedback))
    epoch2 = next_epoch(epoch1, promoted)
    assert ("Масква", "Москва") in epoch2
    assert len(epoch2) == len(epoch1) + 1

    out2 = run_extraction(docs, {}, epoch2).take_all()[0]
    assert "Москва" in out2["full_text"] and "Масква" not in out2["full_text"]
    applied = {(c["from_"], c["to"]) for c in out2["corrections_applied"]}
    assert ("Масква", "Москва") in applied
