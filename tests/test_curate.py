"""End-to-end curation pipeline: planted defects must each be caught
by exactly their stage, survivors carry the mix schedule."""

import pyarrow as pa
import pytest


def _corpus():
    # doc 1: clean           doc 2: exact dup of 1 (dropped, keep min)
    # doc 3: near-dup of 4 (dropped; 4 is canonical min... 3 < 4 so 3
    #        survives and 4 drops)   doc 5: repetitive (quality drop)
    # doc 6: contaminated vs eval    doc 7: clean
    dup = "one two three four five six seven eight nine ten eleven twelve"
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    near = base + " mike"
    rep = "spam spam spam spam spam spam spam spam spam spam"
    contaminated = "zulu yankee xray whiskey victor uniform tango sierra extra words here"
    return pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": [dup, dup, base, near, rep, contaminated, "clean text " + "w x y z a b c d"],
            "source": ["a", "a", "a", "b", "a", "b", "b"],
        }
    )


def _eval():
    return pa.table(
        {
            "doc_id": [100],
            "text": ["zulu yankee xray whiskey victor uniform tango sierra different tail"],
        }
    )


def test_curate_corpus_stages(ray_session):
    import ray.data as rd

    from ocr_service_ray.pipelines.curate import curate_corpus

    out, summary = curate_corpus(
        rd.from_arrow(_corpus()).repartition(3),
        rd.from_arrow(_eval()),
        mix_weights={"a": 2, "b": 1},
        near_dup_threshold=0.5,
        decontam_ngram=8,
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert summary["input"] == 7
    assert summary["after_quality"] == 6          # doc 5 out
    assert summary["after_exact_dedup"] == 5      # doc 2 out (1 kept)
    assert summary["after_near_dedup"] == 4       # doc 4 out (3 kept)
    assert summary["after_decontam"] == 3         # doc 6 out
    assert summary["final"] == 3
    assert df["doc_id"].tolist() == [1, 3, 7]
    # mix schedule: ranks are per-source, keys follow the stride rule
    # lcm(2,1)=2 → stride a:1, b:2
    a_rows = df[df["source"] == "a"].sort_values("rank")
    assert a_rows["mix_key"].tolist() == [1, 3]   # (2r+1)*1
    b_rows = df[df["source"] == "b"]
    assert b_rows["mix_key"].tolist() == [2]      # (2*0+1)*2


def test_curate_no_optional_stages(ray_session):
    import ray.data as rd

    from ocr_service_ray.pipelines.curate import curate_corpus

    out, summary = curate_corpus(rd.from_arrow(_corpus()).repartition(2))
    df = out.to_pandas()
    assert summary["final"] == summary["after_near_dedup"] == len(df) == 4
    assert "mix_key" not in df.columns
