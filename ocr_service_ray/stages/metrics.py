"""Per-BLOCK throughput metrics for the extraction pipeline.

The north rule asks for "per-partition lineage + throughput metrics
emitted per block": partitions get it from the checkpoint manifests
(stages/checkpoint.py); THIS module covers the block grain. A named
zero-CPU collector actor receives one fire-and-forget record per
``map_batches`` invocation — ``(stage, rows, wall_ms)``, ~100 bytes —
so the data plane never blocks on metrics and the driver can drain a
live throughput picture at any time (or at job end, the
``run_extraction_job.py --block-metrics`` path).

Opt-in by construction: stages only look the collector up when
``metrics_name`` is passed, so the default pipeline pays zero actor
calls. At cluster scale one collector handles ~10⁴ records/s (each a
tiny unary actor call); shard the name per job partition if a fleet
ever saturates it — records carry everything needed to merge.
"""

from __future__ import annotations

import time

import numpy as np


def collector_cls():
    """The collector actor class (deferred ``ray.remote`` so importing
    this module never requires an initialized Ray)."""
    import ray

    @ray.remote(num_cpus=0)
    class BlockMetricsCollector:
        def __init__(self):
            self._records: list[tuple[str, int, float]] = []

        def record(self, stage: str, rows: int, wall_ms: float) -> None:
            self._records.append((stage, int(rows), float(wall_ms)))

        def drain(self) -> list[tuple[str, int, float]]:
            out, self._records = self._records, []
            return out

    return BlockMetricsCollector


def create_collector(name: str):
    """Start a named collector; stages resolve it via ``ray.get_actor``."""
    return collector_cls().options(name=name).remote()


def resolve_collector(name: str | None):
    """Actor handle for ``name`` (None → None). Called once per stage
    ACTOR in ``__init__`` — never per batch."""
    if not name:
        return None
    import ray

    return ray.get_actor(name)


def record_batch(collector, stage: str, rows: int, t0: float) -> None:
    """Fire-and-forget one block record (no-op without a collector)."""
    if collector is not None:
        collector.record.remote(stage, rows, (time.perf_counter() - t0) * 1000.0)


def summarize(records: list[tuple[str, int, float]]) -> dict:
    """Per-stage block-throughput summary from drained records."""
    stages: dict[str, list[tuple[int, float]]] = {}
    for stage, rows, ms in records:
        stages.setdefault(stage, []).append((rows, ms))
    out: dict = {}
    for stage, rs in stages.items():
        rows = np.array([r for r, _ in rs], dtype=np.int64)
        ms = np.array([m for _, m in rs], dtype=np.float64)
        total_ms = float(ms.sum())
        out[stage] = {
            "n_blocks": len(rs),
            "rows": int(rows.sum()),
            "total_ms": round(total_ms, 3),
            "rows_per_sec_busy": (
                round(float(rows.sum()) * 1000.0 / total_ms, 2)
                if total_ms > 0
                else None
            ),
            "p50_block_ms": round(float(np.percentile(ms, 50)), 3),
            "p95_block_ms": round(float(np.percentile(ms, 95)), 3),
            "max_block_ms": round(float(ms.max()), 3),
        }
    return out
