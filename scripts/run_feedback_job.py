"""Feedback aggregation job — the reference's active-learning loop
(`scripts/…` + `services/active_learning.py`) as one offline batch run.

    python scripts/run_feedback_job.py --feedback /path/feedback.parquet \\
        --corrections corrections_v1.json --out-dir /tmp/feedback_out

Reads the append-only feedback table, emits:
- ``promoted.parquet``   — A3 promotion candidates (≥2 occurrences,
  mean confidence ≥0.7, sorted);
- ``top_patterns.parquet`` — A4 top-k error patterns;
- ``corrections_v{n+1}.json`` — next corrections-DB epoch (current
  entries + promoted pairs anti-joined against existing keys — the
  epoch semantics replacing the reference's mid-run DB mutation).

With no ``--feedback`` it runs on the deterministic synthetic fixture
(sandbox demo). Guarded ray.init (works standalone and under
``ray job submit``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--feedback", default=None, help="feedback parquet path (default: synthetic fixture)")
    ap.add_argument("--corrections", default=None, help="current corrections JSON (list of [from, to])")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from ocr_service_ray.pipelines.feedback import (
        next_epoch,
        promote_corrections,
        top_error_patterns,
    )
    from ocr_service_ray.sources.synth import corrections_entries, generate_feedback

    if args.feedback:
        feedback = rd.read_parquet(args.feedback)
    else:
        feedback = rd.from_arrow(generate_feedback())

    if args.corrections:
        with open(args.corrections, encoding="utf-8") as f:
            current = [tuple(p) for p in json.load(f)]
    else:
        current = corrections_entries()

    os.makedirs(args.out_dir, exist_ok=True)
    promoted = promote_corrections(feedback)
    promoted.write_parquet(os.path.join(args.out_dir, "promoted"))
    top_error_patterns(feedback, k=args.top_k).write_parquet(
        os.path.join(args.out_dir, "top_patterns")
    )
    new_entries = next_epoch(current, promoted)
    out_json = os.path.join(args.out_dir, "corrections_next.json")
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump([list(p) for p in new_entries], f, ensure_ascii=False, indent=2)
    print(
        json.dumps(
            {
                "promoted": promoted.count(),
                "epoch_entries": len(new_entries),
                "added": len(new_entries) - len(current),
                "out": args.out_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
