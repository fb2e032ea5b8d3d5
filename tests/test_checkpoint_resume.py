"""Resume test (SURVEY.md §5.2): kill after partial partitions, resume,
content-identical output."""

import json
import os
import shutil

import pytest

from ocr_service_ray.pipelines.flagship import run_extraction
from ocr_service_ray.sources.synth import corrections_entries
from ocr_service_ray.stages.checkpoint import (
    completed_shards,
    run_checkpointed,
    span_content_hash,
    table_shards,
)


@pytest.fixture()
def build(small_corpus):
    docs, media = small_corpus

    def build_pipeline(shard):
        return run_extraction(shard, media, corrections_entries())

    return docs, build_pipeline


def test_checkpoint_resume_identical(ray_session, build, tmp_path):
    docs, build_pipeline = build
    shards = table_shards(docs, 4)

    # Full run → reference hashes.
    full_dir = str(tmp_path / "full")
    summary = run_checkpointed(shards, build_pipeline, full_dir, hash_content=True)
    assert summary["rows"] == docs.num_rows
    assert summary["executed"] == [0, 1, 2, 3]
    full_hashes = {
        i: json.load(open(os.path.join(full_dir, f"part={i:05d}", "_manifest.json")))[
            "span_hash"
        ]
        for i in range(4)
    }

    # Simulated crash: copy two completed partitions + one torn .tmp.
    crash_dir = str(tmp_path / "crash")
    os.makedirs(crash_dir)
    for i in (0, 2):
        shutil.copytree(
            os.path.join(full_dir, f"part={i:05d}"),
            os.path.join(crash_dir, f"part={i:05d}"),
        )
    os.makedirs(os.path.join(crash_dir, "part=00001.tmp"))  # torn write
    assert completed_shards(crash_dir) == {0, 2}

    resumed = run_checkpointed(shards, build_pipeline, crash_dir, hash_content=True)
    assert resumed["skipped"] == [0, 2]
    assert resumed["executed"] == [1, 3]

    for i in range(4):
        part = os.path.join(crash_dir, f"part={i:05d}")
        mf = json.load(open(os.path.join(part, "_manifest.json")))
        assert mf["span_hash"] == full_hashes[i], f"partition {i} differs after resume"
        assert mf["rows"] > 0 and mf["t_wall_sec"] >= 0  # lineage + metrics present
        assert span_content_hash(part) == full_hashes[i]


def test_parallel_shards_match_sequential(ray_session, build, tmp_path):
    """max_in_flight > 1 runs shards concurrently; every partition's
    content hash must equal the strictly-sequential run's (commit
    atomicity and output bytes are in-flight-count independent)."""
    docs, build_pipeline = build
    shards = table_shards(docs, 4)

    seq_dir = str(tmp_path / "seq")
    par_dir = str(tmp_path / "par")
    s1 = run_checkpointed(
        shards, build_pipeline, seq_dir, hash_content=True, max_in_flight=1
    )
    s2 = run_checkpointed(
        shards, build_pipeline, par_dir, hash_content=True, max_in_flight=4
    )
    assert s1["executed"] == s2["executed"] == [0, 1, 2, 3]
    assert s1["rows"] == s2["rows"]
    for i in range(4):
        h = [
            json.load(
                open(os.path.join(d, f"part={i:05d}", "_manifest.json"))
            )["span_hash"]
            for d in (seq_dir, par_dir)
        ]
        assert h[0] == h[1], f"partition {i} differs under parallel execution"


def test_no_resume_overwrites(ray_session, build, tmp_path):
    docs, build_pipeline = build
    shards = table_shards(docs.slice(0, 20), 2)
    out = str(tmp_path / "o")
    run_checkpointed(shards, build_pipeline, out)
    s = run_checkpointed(shards, build_pipeline, out, resume=False)
    assert s["executed"] == [0, 1] and s["skipped"] == []
