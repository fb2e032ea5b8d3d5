"""Index-build job — the retrieval-index lifecycle end to end.

    python scripts/run_index_job.py --input /root/testdata/sf0.01 \\
        --out-dir /tmp/index_out [--indexes inverted,ivf,lsh]

Builds each requested index as a PARTITIONED parquet layout (the
physical layout IS the index — a lookup reads only its bucket/cell
directories, the partition-pruning discipline of ops/invindex.py and
ops/similarity.py), writes one ``_manifest.json`` per index with the
layout parameters + row counts, and smoke-probes each index once so a
failed build never publishes a dead manifest:

- ``inverted/`` — term-bucket hive postings (64 buckets); probed with
  an AND lookup over ["join", "hash"].
- ``ivf/``      — IVF-flat cell partitions (nlist=16); probed with a
  top-5 search on the first corpus vector.
- ``lsh/``      — hyperplane sign-bit cells (nbits=4); probed the
  same way.

Guarded ray.init (driver/cron owns the session when present).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir with documents/embeddings parquet")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--indexes", default="inverted,ivf,lsh")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=16)
    ap.add_argument("--nbits", type=int, default=4)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    import numpy as np
    import pyarrow.parquet as pq

    from ocr_service_ray.ops.invindex import InvertedIndex
    from ocr_service_ray.ops.similarity import IvfIndex, LshIndex
    from ocr_service_ray.sources.readers import read_parquet_clean

    os.makedirs(args.out_dir, exist_ok=True)
    indexes = args.indexes.split(",")
    report: dict = {}

    if "inverted" in indexes:
        t0 = time.time()
        path = os.path.join(args.out_dir, "inverted")
        idx = InvertedIndex(num_buckets=args.num_buckets).build(
            read_parquet_clean(
                f"{args.input}/documents.parquet", columns=["doc_id", "text"]
            ),
            path,
        )
        probe = idx.search_and(["join", "hash"])
        manifest = {
            "kind": "inverted",
            "num_buckets": args.num_buckets,
            "probe_terms": ["join", "hash"],
            "probe_hits": len(probe),
            "build_sec": round(time.time() - t0, 3),
        }
        with open(os.path.join(path, "_manifest.json"), "w") as f:
            json.dump(manifest, f)
        report["inverted"] = manifest

    first_vec = None
    if {"ivf", "lsh"} & set(indexes):
        head = pq.read_table(
            f"{args.input}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).slice(0, 1)
        first_vec = np.asarray(head["embedding"].to_pylist()[0], dtype=np.float64)

    if "ivf" in indexes:
        t0 = time.time()
        path = os.path.join(args.out_dir, "ivf")
        idx = IvfIndex(nlist=args.nlist).build(
            read_parquet_clean(f"{args.input}/embeddings.parquet"),
            index_path=path,
        )
        hits = idx.search(first_vec, k=5).to_pandas()
        manifest = {
            "kind": "ivf",
            "nlist": args.nlist,
            "nprobe": idx.nprobe,
            "probe_hits": len(hits),
            "build_sec": round(time.time() - t0, 3),
        }
        with open(os.path.join(path, "_manifest.json"), "w") as f:
            json.dump(manifest, f)
        report["ivf"] = manifest

    if "lsh" in indexes:
        t0 = time.time()
        path = os.path.join(args.out_dir, "lsh")
        idx = LshIndex(nbits=args.nbits).build(
            read_parquet_clean(f"{args.input}/embeddings.parquet"),
            dim=len(first_vec),
            index_path=path,
        )
        hits = idx.search(first_vec, k=5).to_pandas()
        manifest = {
            "kind": "lsh",
            "nbits": args.nbits,
            "probe_hits": len(hits),
            "build_sec": round(time.time() - t0, 3),
        }
        with open(os.path.join(path, "_manifest.json"), "w") as f:
            json.dump(manifest, f)
        report["lsh"] = manifest

    print(json.dumps({"out": args.out_dir, **report}))


if __name__ == "__main__":
    main()
