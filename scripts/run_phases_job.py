"""Three-phase pipeline run — the reference's
``scripts/process_certificates_all_phases.py`` pattern (phase 1 base
extraction, phase 2 + optional ML stages, phase 3 + feedback
promotion into the next corrections epoch), with a per-phase
comparison summary instead of per-doc eyeball files.

    python scripts/run_phases_job.py --input testdata:/root/testdata/sf0.001 \\
        --out-dir /tmp/phases_out [--replicate 1]

Each phase writes partitioned parquet under ``<out>/phase{N}/`` plus
``summary.json``; the final ``comparison.json`` mirrors the
reference's phase1-vs-phase2-vs-phase3 stats block
(``process_certificates_all_phases.py:310-359``). Guarded ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="testdata:<sf_dir>")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--replicate", type=int, default=1)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_service_ray.pipelines.derive import derive_documents_batch
    from ocr_service_ray.pipelines.feedback import next_epoch, promote_corrections
    from ocr_service_ray.pipelines.flagship import corpus_summary, run_extraction
    from ocr_service_ray.sources.synth import corrections_entries, generate_feedback
    from ocr_service_ray.stages.ml import with_ml_stages
    from ocr_service_ray.stages.ocr import GENERATE_MEDIA

    src = pq.read_table(
        f"{args.input.removeprefix('testdata:')}/documents.parquet",
        columns=["doc_id", "text"],
    )
    corpus = derive_documents_batch(src, replicate=args.replicate)
    os.makedirs(args.out_dir, exist_ok=True)
    epoch1 = corrections_entries()
    summaries = {}

    def run_phase(name: str, corrections, ml: bool):
        out = run_extraction(corpus, GENERATE_MEDIA, corrections)
        if ml:
            def add_hw(b: pa.Table) -> pa.Table:
                return b.append_column(
                    "n_handwritten", pa.array([0] * b.num_rows, pa.int64())
                )

            out = with_ml_stages(
                out.map_batches(add_hw, batch_format="pyarrow"),
                spell=True,
                classify=True,
                ml_quality=True,
                text_col="full_text",
            )
        out = out.materialize()
        out.write_parquet(os.path.join(args.out_dir, name))
        summaries[name] = corpus_summary(out)
        with open(os.path.join(args.out_dir, f"{name}_summary.json"), "w") as f:
            json.dump(summaries[name], f, indent=2, default=float)

    # Phase 1: base extraction, epoch-1 corrections
    run_phase("phase1", epoch1, ml=False)
    # Phase 2: + optional ML stages (fake backends in this sandbox)
    run_phase("phase2", epoch1, ml=True)
    # Phase 3: promote feedback → next epoch → reprocess
    promoted = promote_corrections(rd.from_arrow(generate_feedback()))
    epoch2 = next_epoch(epoch1, promoted)
    run_phase("phase3", epoch2, ml=False)

    comparison = {
        name: {
            "documents": int(s["documents"]),
            "mean_quality": float(s["mean_quality"]),
            "total_corrections": int(s["total_corrections"]),
        }
        for name, s in summaries.items()
    }
    comparison["epoch2_added_entries"] = len(epoch2) - len(epoch1)
    with open(os.path.join(args.out_dir, "comparison.json"), "w") as f:
        json.dump(comparison, f, indent=2)
    print(json.dumps(comparison))


if __name__ == "__main__":
    main()
