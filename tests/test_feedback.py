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
