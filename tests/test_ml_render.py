"""Optional-ML actor stages (T2/T3/T4), rendering/sinks (S7/S9), and
relational extras (O8 split, D3 unique, D4 anti-join)."""

import json

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------- T2-T4


def test_spell_stage_identity_guards(docs_ds):
    from ocr_service_ray.stages.ml import SpellCorrectorStage

    out = docs_ds.map_batches(
        SpellCorrectorStage, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    # sandbox backend is the identity fake — guards must pass text through
    assert (out["ml_corrected_text"] == out["text"]).all()
    assert (out["corrector_backend"] == "fake-identity").all()


def test_spell_guards_reject_bad_output():
    from ocr_service_ray.stages.ml import SpellCorrectorStage

    stage = SpellCorrectorStage()
    # too short / too long → untouched without invoking the model
    assert stage._correct_one("ab") == "ab"
    long = "x" * 600
    assert stage._correct_one(long) == long
    # model output with <extra_id or bad length is rejected
    stage._infer = lambda t: "<extra_id_0> junk"
    stage._model = object()
    assert stage._correct_one("hello world") == "hello world"
    stage._infer = lambda t: "x"  # < 0.5× input length
    assert stage._correct_one("hello world") == "hello world"
    stage._infer = lambda t: t.upper()  # acceptable length → adopted
    assert stage._correct_one("hello world") == "HELLO WORLD"


def test_classifier_conditional_application(ray_session):
    import ray.data as rd

    from ocr_service_ray.stages.ml import DocumentClassifierStage

    tbl = pa.table(
        {
            "doc_id": ["a", "b", "c", "d"],
            "template": ["invoice", None, "", None],
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DocumentClassifierStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .set_index("doc_id")
    )
    # template wins when present
    assert out.loc["a", "document_type"] == "invoice"
    assert out.loc["a", "type_confidence"] == 1.0
    # no template → prediction adopted only above the 0.7 threshold
    for k in ("b", "c", "d"):
        conf = out.loc[k, "type_confidence"]
        dt = out.loc[k, "document_type"]
        if conf > 0.7:
            assert dt in DocumentClassifierStage().class_names
        else:
            assert dt == ""


def test_ml_combined_quality_formula():
    from ocr_service_ray.stages.ml import ml_combined_quality

    ml = np.array([0.9, 0.1, 0.5])
    ocr = np.array([0.8, 0.9, 0.5])
    hw = np.array([0.0, 0.0, 30.0])
    got = ml_combined_quality(ml, ocr, hw)
    # normal path: 0.2*ml + 0.6*ocr + 0.2*1
    assert got[0] == pytest.approx(0.2 * 0.9 + 0.6 * 0.8 + 0.2)
    # divergence |0.1-0.9| > 0.3 → 0.8*ocr + 0.2*ml
    assert got[1] == pytest.approx(0.8 * 0.9 + 0.2 * 0.1)
    # handwritten term clamps at 0 (1 - 0.05*30 < 0)
    assert got[2] == pytest.approx(0.2 * 0.5 + 0.6 * 0.5 + 0.0)


def test_with_ml_stages_appends_all(ray_session):
    import ray.data as rd

    from ocr_service_ray.stages.ml import with_ml_stages

    tbl = pa.table(
        {
            "doc_id": ["a", "b"],
            "text": ["hello world", "привет мир"],
            "ocr_confidence": [0.9, 0.4],
            "n_handwritten": [0, 2],
        }
    )
    out = with_ml_stages(
        rd.from_arrow(tbl), spell=True, classify=True, ml_quality=True, concurrency=1
    ).to_pandas()
    for col in (
        "ml_corrected_text",
        "document_type",
        "type_confidence",
        "ml_score",
        "ml_combined_quality",
    ):
        assert col in out.columns
    assert ((out["ml_combined_quality"] >= 0) & (out["ml_combined_quality"] <= 1)).all()


# ---------------------------------------------------------------- S7/S9


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    from ocr_service_ray.pipelines.flagship import run_extraction
    from ocr_service_ray.sources.synth import corrections_entries, generate_corpus

    docs, media = generate_corpus(40, seed=3)
    return run_extraction(docs, media, corrections_entries()).materialize()


def test_render_json_round_trips(extracted):
    from ocr_service_ray.stages.render import render_output

    rows = render_output(extracted, fmt="json").take_all()
    assert len(rows) == 40
    for row in rows[:5]:
        payload = json.loads(row["rendered"])
        assert payload["doc_id"] == row["doc_id"]
        assert "full_text" in payload and "critical_fields" in payload


def test_render_text_layout(extracted):
    from ocr_service_ray.stages.render import render_output

    row = render_output(extracted, fmt="text").take(1)[0]
    assert row["rendered"].startswith(f"=== Документ: {row['doc_id']} ===")


def test_write_rendered_sink(extracted, tmp_path):
    import pyarrow.parquet as pq

    from ocr_service_ray.stages.render import write_rendered

    out = tmp_path / "rendered"
    write_rendered(extracted, str(out), fmt="text")
    got = pq.read_table(str(out))
    assert got.num_rows == 40
    assert set(got.column_names) == {"doc_id", "rendered"}


def test_summary_json(extracted, tmp_path):
    from ocr_service_ray.stages.render import summary_json

    path = tmp_path / "summary.json"
    text = summary_json(extracted, str(path))
    payload = json.loads(text)
    assert payload["documents"] == 40
    assert 0 <= payload["mean_quality"] <= 1
    assert json.loads(path.read_text()) == payload


# ------------------------------------------------------- O8 / D3 / D4


def test_distinct_values(docs_ds):
    import pyarrow.parquet as pq

    from ocr_service_ray.ops.relational import distinct_values

    got = distinct_values(docs_ds, "lang")
    want = sorted(set(pq.read_table(f"{SF}/documents.parquet")["lang"].to_pylist()))
    assert got == want


def test_train_val_split_positional(docs_ds):
    from ocr_service_ray.ops.relational import train_val_split

    train, val = train_val_split(docs_ds, 0.8, sort_col="doc_id")
    n = docs_ds.count()
    assert train.count() == int(n * 0.8)
    assert val.count() == n - int(n * 0.8)
    # positional: max train doc_id < min val doc_id
    assert max(train.unique("doc_id")) < min(val.unique("doc_id"))


def test_broadcast_anti_join(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.relational import broadcast_anti_join

    ds = rd.from_arrow(pa.table({"k": [1, 2, 3, 4, 5], "v": list("abcde")}))
    out = broadcast_anti_join(ds, {2, 4}, on="k").to_pandas()
    assert sorted(out["k"]) == [1, 3, 5]


# ------------------------------------------------- multimodal / jaccard


def test_resize_stage_dims(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.multimodal import ResizeImageStage, synthesize_media_items

    out = (
        rd.from_arrow(synthesize_media_items(40))
        .map_batches(ResizeImageStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert (out[["width", "height"]].max(axis=1) <= 512).all()
    assert (out[["width", "height"]].min(axis=1) >= 1).all()


def test_audio_feature_stage_windows(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.multimodal import AudioFeatureStage, synthesize_media_items

    items = synthesize_media_items(20)
    out = (
        rd.from_arrow(items)
        .map_batches(AudioFeatureStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert (out["rms_micro"] >= 0).all()
    assert (out["peak"] <= 127).all()
    # one row per 1024-byte window, at least one per item
    assert set(out["item_id"]) == set(items["item_id"].to_pylist())


def test_media_pipeline_routes_all_types(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.multimodal import media_pipeline, synthesize_media_items

    items = synthesize_media_items(60)
    out = media_pipeline(rd.from_arrow(items)).to_pandas()
    assert set(out["feature"]) == {"image", "audio", "video"}
    # every item surfaces in exactly its type's feature table
    got_ids = set(out["item_id"])
    assert got_ids == set(items["item_id"].to_pylist())


def test_ngram_jaccard_pairs_matches_kernel(docs_ds):
    import pyarrow.parquet as pq

    from ocr_service_ray.ops.dedup import ngram_jaccard, ngram_jaccard_pairs

    out = (
        ngram_jaccard_pairs(docs_ds, pair_key=lambda i: i // 2)
        .to_pandas()
        .set_index("id_a")
    )
    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(raw["doc_id"], raw["text"]))
    assert len(out) == len(raw) // 2
    for id_a in list(out.index)[:20]:
        want = ngram_jaccard(texts[id_a], texts[id_a + 1])
        assert out.loc[id_a, "jaccard"] == pytest.approx(want)


def test_real_engine_adapters_fail_fast():
    """Missing OCR backends must surface at actor __init__, not mid-run."""
    import pytest as _pytest

    from ocr_service_ray.engines import make_engine

    for name in ("tesseract", "onnx"):
        with _pytest.raises(NotImplementedError):
            make_engine(name)


def test_phase1_vs_phase2_diff(ray_session):
    """The reference's test_phase2 flow: run the base pipeline (phase
    1), then the same pipeline with the optional ML stages appended
    (phase 2), and diff — base columns identical, ML columns added."""
    from ocr_service_ray.pipelines.flagship import run_extraction
    from ocr_service_ray.sources.synth import corrections_entries, generate_corpus
    from ocr_service_ray.stages.ml import with_ml_stages

    docs, media = generate_corpus(30, seed=5)
    base = run_extraction(docs, media, corrections_entries())
    phase1 = base.to_pandas().sort_values("doc_id").reset_index(drop=True)

    base2 = run_extraction(docs, media, corrections_entries())
    # ml_quality needs n_handwritten; derive from regions like check_quality
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_hw(b: pa.Table) -> pa.Table:
        return b.append_column(
            "n_handwritten", pa.array([0] * b.num_rows, pa.int64())
        )

    phase2 = (
        with_ml_stages(
            base2.map_batches(add_hw, batch_format="pyarrow"),
            spell=True,
            classify=True,
            ml_quality=True,
            text_col="full_text",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # base columns unchanged by the optional stages
    for col in ("doc_id", "full_text", "ocr_confidence", "n_corrections"):
        assert (phase1[col] == phase2[col]).all()
    # phase 2 adds the ML columns
    for col in ("ml_corrected_text", "document_type", "ml_combined_quality"):
        assert col in phase2.columns and col not in phase1.columns
