"""Corpus curation job — the end-to-end training-data pipelines as a
submittable entrypoint (`ray job submit -- python
scripts/run_curation_job.py ...`).

    python scripts/run_curation_job.py --input /root/testdata/sf0.01 \\
        --out-dir /tmp/curated --pipeline curate \\
        [--eval-split-mod 20] [--mix src0=5,src1=3] \\
        [--staging-path /tmp/curation_stages] [--minhash-hash fast]

    python scripts/run_curation_job.py --input ... --pipeline prune \\
        [--cap-per-source 1000] [--paragraph-sep $'\\n']

Writes the curated/pruned corpus as partitioned parquet under
--out-dir plus a JSON summary line (per-stage survivor counts) on
stdout. --staging-path pins stage boundaries to storage instead of
the object store — the corpus-scale tier, and a re-run can resume
from the written stages. Guarded ray.init (never inside library code).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="dir containing documents.parquet")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--pipeline", choices=["curate", "prune"], default="curate")
    ap.add_argument("--eval-split-mod", type=int, default=0,
                    help="decontaminate vs docs with doc_id %% MOD == 0 (0 = off)")
    ap.add_argument("--mix", default="",
                    help="source weights, e.g. src0=5,src1=3 (curate only)")
    ap.add_argument("--near-dup-threshold", type=float, default=0.5)
    ap.add_argument("--minhash-hash", choices=["oracle", "fast"], default="fast")
    ap.add_argument("--cap-per-source", type=int, default=1000)
    ap.add_argument("--paragraph-sep", default="\n")
    ap.add_argument("--staging-path", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow as pa

    from ocr_service_ray.sources.readers import read_parquet_clean

    docs = read_parquet_clean(
        f"{args.input}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    if args.pipeline == "curate":
        from ocr_service_ray.pipelines.curate import curate_corpus

        eval_ds = None
        if args.eval_split_mod > 1:
            mod = args.eval_split_mod

            def split(want_eval: bool):
                def f(b: pa.Table) -> pa.Table:
                    ids = b["doc_id"].to_numpy(zero_copy_only=False)
                    m = (ids % mod == 0) if want_eval else (ids % mod != 0)
                    return b.filter(pa.array(m))

                return docs.map_batches(f, batch_format="pyarrow")

            eval_ds, docs = split(True), split(False)
        weights = None
        if args.mix:
            weights = {
                k: int(v) for k, v in (p.split("=") for p in args.mix.split(","))
            }
        out, summary = curate_corpus(
            docs,
            eval_ds,
            mix_weights=weights,
            near_dup_threshold=args.near_dup_threshold,
            staging_path=args.staging_path,
            minhash_hash=args.minhash_hash,
        )
    else:
        from ocr_service_ray.pipelines.curate import prune_corpus

        out, summary = prune_corpus(
            docs,
            cap_per_source=args.cap_per_source,
            sep=args.paragraph_sep,
            staging_path=args.staging_path,
        )

    out.write_parquet(args.out_dir)
    print(json.dumps({"pipeline": args.pipeline, "out": args.out_dir, **summary}))


if __name__ == "__main__":
    main()
