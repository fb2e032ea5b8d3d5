"""Training-data prep — the reference's ``scripts/prepare_training_data.py``
+ ``train_classifier.py`` data path (SURVEY.md §2.6 O8, §2.7 D3) as a
batch job.

    python scripts/prepare_training_data.py --input /root/testdata/sf0.01 \\
        --out-dir /tmp/train_out [--limit 20] [--train-fraction 0.8]

Writes ``train/`` and ``val/`` parquet splits (positional, unshuffled,
sorted by doc_id — the reference's 80/20 split) plus ``vocab.json``
(the distinct document-source vocabulary, D3). Guarded ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--limit", type=int, default=0, help="cap docs (reference pairs[:20] pattern); 0 = all")
    ap.add_argument("--train-fraction", type=float, default=0.8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from ocr_service_ray.ops.relational import distinct_values, train_val_split

    ds = rd.read_parquet(f"{args.input}/documents.parquet")
    if args.limit:
        ds = ds.sort("doc_id").limit(args.limit)
    train, val = train_val_split(ds, args.train_fraction, sort_col="doc_id")
    os.makedirs(args.out_dir, exist_ok=True)
    train.write_parquet(os.path.join(args.out_dir, "train"))
    val.write_parquet(os.path.join(args.out_dir, "val"))
    vocab = distinct_values(rd.read_parquet(f"{args.input}/documents.parquet"), "source")
    with open(os.path.join(args.out_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=2)
    print(
        json.dumps(
            {"train": train.count(), "val": val.count(), "vocab": len(vocab), "out": args.out_dir}
        )
    )


if __name__ == "__main__":
    main()
