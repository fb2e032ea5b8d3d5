"""Benchmark harness.

Default mode: runs the headline flagship extraction pipeline plus a
representative query set over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

``--scaling``: runs the headline pipeline in two FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (the sandbox stand-in
for N vs 4N node clusters) and prints throughputs + scaling
efficiency. A warm-up pass primes the page cache so the comparison
measures compute+shuffle, not first-touch disk reads.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Corpus amplification for the headline run: 5000 sf0.1 docs are only
# ~30 CPU-seconds of extraction work — far too little to measure
# parallel throughput (fixed startup would dominate). 48× replication
# (240k docs) keeps 32 CPUs busy for ~15-20s.
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "48"))
# The scaling comparison needs even more work so the 32-CPU run's
# actor-spawn/ramp overhead (~2-3s) is amortized — efficiency is about
# steady-state throughput, not job startup.
SCALING_REPLICATE = int(os.environ.get("BENCH_SCALING_REPLICATE", "96"))

# Queries timed alongside the headline (a cross-section: kernel-bound,
# shuffle-bound, join, window, ANN, LSH).
BENCH_QUERIES = [
    "correct_text_guards",
    "token_counts",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "windowed_events",
    "sessionize_users",
    "lineitem_pricing",
    "hash_join_orders_lineitem",
    "knn_brute",
    "near_dup_sample",
]


def consume(ds) -> int:
    """Force full execution of a lazy Dataset; return row count.
    count() executes the whole plan but never ships row data to the
    driver — iter_batches would serialize the output through one
    driver-side deserialization loop and cap measured throughput."""
    return ds.count()


def run_bench(flagship_only: bool = False) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()

    # Headline: flagship extraction over the derived interleaved corpus.
    from ocr_service_ray.pipelines.derive import derived_corpus
    from ocr_service_ray.pipelines.flagship import run_extraction
    from ocr_service_ray.stages.ocr import GENERATE_MEDIA

    ctx.execution_options.preserve_order = False
    # Wide-ish rows + a CPU-bound per-doc kernel: small blocks keep the
    # actor-pool task granularity fine so no actor idles behind a
    # coarse task (block size, not batch_size, is the scheduling unit).
    ctx.target_max_block_size = 256 * 1024

    # One FUSED extraction pool (OCR engine is CPU-bound here) sized at
    # 3/4 of the CPUs at EVERY cluster size — the same fraction at N
    # and 4N is what makes the scaling comparison apples-to-apples.
    # Never size a pool to ALL CPUs: the read/derive tasks need slots
    # too (a pool reserving every CPU deadlocks the pipeline).
    pool = max(2, NUM_CPUS * 3 // 4)

    def build():
        return run_extraction(
            derived_corpus(SF_DIR, REPLICATE, num_blocks=64),
            GENERATE_MEDIA,
            kernel_batch_size=128,
            kernel_concurrency=pool,
            fused=True,
        )

    # One untimed full pass warms Ray worker processes (imports, actor
    # spawn, page cache) — the timed pass then measures steady-state
    # compute + shuffle, which is what throughput/scaling should mean.
    n_docs_warm = consume(build())

    t0 = time.perf_counter()
    n_docs = consume(build())
    headline = time.perf_counter() - t0
    assert n_docs == n_docs_warm

    queries: dict[str, float] = {}
    if not flagship_only:
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            consume(qs[name](SF_DIR))
            queries[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "flagship_extraction_e2e",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 2),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_FLAGSHIP_ONLY="1",
            BENCH_REPLICATE=str(SCALING_REPLICATE),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    tp_lo = r_lo["docs_per_sec"]
    tp_hi = r_hi["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": tp_lo,
        "docs_per_sec_32": tp_hi,
        "n_docs": r_hi["n_docs"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench(flagship_only=os.environ.get("BENCH_FLAGSHIP_ONLY") == "1")))
