"""Corpus dedup job — the training-data dedup family end to end.

    python scripts/run_dedup_job.py --input /root/testdata/sf0.01 \\
        --out-dir /tmp/dedup_out [--methods exact,minhash,simhash]

Writes one parquet dataset per method:
- ``exact/``    — {text_hash, keep_id, dups} groups;
- ``minhash/``  — near-dup pairs {id_a, id_b, est_jaccard};
- ``simhash/``  — near-dup pairs {id_a, id_b, hamming};
- ``paragraph/`` — documents rewritten with globally-duplicate
  paragraphs removed {doc_id, text, n_kept} (opt-in: add ``paragraph``
  to --methods);
- ``delta/`` — with ``--delta-against BASE_DIR``: --input classified
  as an appended shard vs the standing base ({doc_id, status,
  match_id}; ops/incremental.delta_dedup — the ingest-refresh mode
  that never re-dedupes the base).

Run exact first on real corpora; identical texts should never reach
the near-dup passes (ops/dedup.py skew note). Guarded ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--methods", default="exact,minhash,simhash")
    ap.add_argument("--minhash-threshold", type=float, default=0.4)
    ap.add_argument("--max-hamming", type=int, default=8)
    ap.add_argument("--paragraph-sep", default="\n")
    ap.add_argument(
        "--delta-against",
        default=None,
        help="sf dir of the STANDING base corpus: classify --input as an "
        "appended shard against it (ops/incremental.delta_dedup)",
    )
    ap.add_argument(
        "--hash-mode",
        default="oracle",
        choices=["oracle", "fast"],
        help="delta-mode signature hashing: md5 (SQL-reproducible) or the "
        "vectorized fast path",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    import ray.data as rd

    from ocr_service_ray.ops import dedup

    def docs():
        return rd.read_parquet(
            f"{args.input}/documents.parquet", columns=["doc_id", "text"]
        )

    os.makedirs(args.out_dir, exist_ok=True)
    counts = {}
    methods = args.methods.split(",")
    if "exact" in methods:
        out = dedup.exact_dedup(docs())
        out.write_parquet(os.path.join(args.out_dir, "exact"))
        counts["exact_groups"] = out.count()
    if "minhash" in methods:
        out = dedup.minhash_lsh_candidates(docs(), threshold=args.minhash_threshold)
        out.write_parquet(os.path.join(args.out_dir, "minhash"))
        counts["minhash_pairs"] = out.count()
    if "simhash" in methods:
        out = dedup.simhash_candidates(docs(), max_hamming=args.max_hamming)
        out.write_parquet(os.path.join(args.out_dir, "simhash"))
        counts["simhash_pairs"] = out.count()
    if "paragraph" in methods:
        # line-level dedup: rewrites surviving documents (not pairs)
        out = dedup.paragraph_dedup(docs(), sep=args.paragraph_sep)
        out.write_parquet(os.path.join(args.out_dir, "paragraph"))
        counts["paragraph_docs"] = out.count()
    if args.delta_against:
        # incremental maintenance: classify --input as an APPENDED
        # shard against the standing base corpus (never re-dedupes
        # the base); writes {doc_id, status, match_id} + a summary
        from ocr_service_ray.ops.incremental import delta_dedup

        base = rd.read_parquet(
            f"{args.delta_against}/documents.parquet",
            columns=["doc_id", "text"],
        )
        res = delta_dedup(base, docs(), hash=args.hash_mode)
        rd.from_pandas(res).write_parquet(os.path.join(args.out_dir, "delta"))
        counts["delta_docs"] = len(res)
        counts["delta_status"] = res["status"].value_counts().to_dict()
    print(json.dumps({**counts, "out": args.out_dir}))


if __name__ == "__main__":
    main()
