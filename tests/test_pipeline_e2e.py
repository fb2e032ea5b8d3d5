"""E2E conformance: the Ray pipeline must match the pure-Python oracle
row-for-row — span-sequence equality (kind, text, media_ref, order)
per doc_id plus all derived columns (SURVEY.md §5.2)."""

import pyarrow as pa
import pytest

from ocr_service_ray.oracle import process_document
from ocr_service_ray.pipelines.flagship import corpus_summary, run_extraction
from ocr_service_ray.sources.synth import corrections_entries
from ocr_service_ray.stages.ocr import media_table_to_registry


@pytest.fixture(scope="module")
def pipeline_and_oracle(ray_session, small_corpus, corrections_db):
    docs, media = small_corpus
    out = run_extraction(docs, media, corrections_entries()).to_pandas()
    registry = media_table_to_registry(media)
    oracle_rows = {
        doc["doc_id"]: process_document(doc, registry, corrections_db)
        for doc in docs.to_pylist()
    }
    return out, oracle_rows


def test_row_count(pipeline_and_oracle):
    out, oracle_rows = pipeline_and_oracle
    assert len(out) == len(oracle_rows) == 200
    assert set(out["doc_id"]) == set(oracle_rows)


def test_span_sequence_exact_match(pipeline_and_oracle):
    """The per-row invariant: (kind, text, media_ref, order) equality."""
    out, oracle_rows = pipeline_and_oracle
    for _, row in out.iterrows():
        expected = oracle_rows[row["doc_id"]]["spans"]
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]
        ]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected]
        assert got == want, row["doc_id"]


def test_derived_columns_match_oracle(pipeline_and_oracle):
    out, oracle_rows = pipeline_and_oracle
    for _, row in out.iterrows():
        exp = oracle_rows[row["doc_id"]]
        assert row["full_text"] == exp["full_text"], row["doc_id"]
        assert row["raw_text"] == exp["raw_text"]
        assert row["critical_fields"] == exp["critical_fields"]
        assert list(row["important_inn"]) == exp["important_inn"]
        assert list(row["important_surnames"]) == exp["important_surnames"]
        assert row["overall_quality"] == pytest.approx(exp["overall_quality"])
        assert row["ocr_confidence"] == pytest.approx(exp["ocr_confidence"])
        assert bool(row["needs_review"]) == exp["needs_review"]
        assert row["total_pages"] == exp["total_pages"]
        assert row["n_corrections"] == exp["n_corrections"]
        got_corr = [
            (c["from_"], c["to"], c["confidence"], c["method"])
            for c in row["corrections_applied"]
        ]
        want_corr = [
            (c["from_"], c["to"], c["confidence"], c["method"])
            for c in exp["corrections_applied"]
        ]
        assert got_corr == want_corr


def test_corrections_present_in_corpus(pipeline_and_oracle):
    # The planted 0/8 errors must actually exercise the corrector.
    out, _ = pipeline_and_oracle
    assert out["n_corrections"].sum() > 100


def test_error_row_semantics(ray_session, small_corpus):
    """A poison document (dangling media_ref) becomes an error row; the
    run continues (core/processor.py:431-438 semantics)."""
    docs, media = small_corpus
    poison = pa.Table.from_pydict(
        {
            "doc_id": ["doc-poison"],
            "spans": [[{"kind": "image", "text": "", "media_ref": "m-missing", "offset": 0}]],
        },
        schema=docs.schema,
    )
    both = pa.concat_tables([docs.slice(0, 10), poison])
    out = run_extraction(both, media, corrections_entries()).to_pandas()
    assert len(out) == 11
    err = out[out["doc_id"] == "doc-poison"].iloc[0]
    assert err["error"] != "" and err["needs_review"]
    ok = out[out["doc_id"] != "doc-poison"]
    assert (ok["error"] == "").all()


def test_idempotence_of_correction(small_corpus, corrections_db):
    """Property: contextual correction is idempotent (no 0/8 digits
    remain inside Russian words after one pass)."""
    from ocr_service_ray.kernels.correct import contextual_correct

    docs, _ = small_corpus
    for doc in docs.to_pylist()[:50]:
        for span in doc["spans"]:
            if span["kind"] == "text":
                once, _ = contextual_correct(span["text"])
                twice, corr = contextual_correct(once)
                assert twice == once and corr == []


def test_corpus_summary(pipeline_and_oracle, ray_session, small_corpus):
    docs, media = small_corpus
    summary = corpus_summary(run_extraction(docs, media, corrections_entries()))
    assert summary["documents"] == 200
    assert 0.0 <= summary["mean_quality"] <= 1.0
    assert summary["total_corrections"] > 100


def test_scan_media_resolver_matches_broadcast(ray_session, small_corpus, tmp_path):
    """The scale-path media resolution (per-batch pushed-down isin
    reads of a media parquet dataset — stages/ocr.py ScanMediaResolver)
    must produce exactly the broadcast resolver's output."""
    import pyarrow.parquet as pq

    docs, media = small_corpus
    media_path = str(tmp_path / "media")
    import os

    os.makedirs(media_path, exist_ok=True)
    # written sorted by media_ref — the clustering assumption the
    # filtered read relies on (stages/ocr.py docstring)
    pq.write_table(
        media.sort_by("media_ref"), f"{media_path}/media.parquet", row_group_size=256
    )

    want = (
        run_extraction(docs, media, corrections_entries())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        run_extraction(docs, media_path, corrections_entries())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["doc_id"] == want["doc_id"]).all()
    for col in ("full_text", "critical_fields", "n_corrections", "total_pages",
                "ocr_confidence", "overall_quality", "error"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
