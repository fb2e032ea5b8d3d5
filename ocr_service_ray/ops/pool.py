"""Cluster-adaptive actor-pool sizing for broadcast-holding stages.

Most per-row stages in this repo are plain task pools (no
``concurrency=``), which Ray Data already scales to the cluster. The
exception is the broadcast-holding ACTOR pool — a callable class whose
``__init__`` pulls a ``ray.put`` artifact (bloom bitmap, key set,
centroid table, gram set) once per actor. Those pools were sized with
a literal ``concurrency=(1, 8)``: right on the 8-32-CPU sandbox, but
a hard throughput cap on a multi-node cluster — 8 actors cannot
drain a 4096-core stream no matter how wide the upstream is.

``bcast_pool()`` keeps the autoscaling shape (min 1 actor — the pool
only grows under backlog, so small inputs still pay a single init)
and raises the CAP with the cluster: half the CPUs, floored at the
old literal 8 so sandbox behavior is unchanged, ceilinged at 64 —
past ~64 actors the per-actor ``ray.get`` init traffic and actor
management overhead outweigh map parallelism for these thin filter
stages (they are memory-bandwidth-bound, not CPU-bound; a pool at
half the cluster already saturates the stream while leaving slots
for the operators feeding it).
"""

from __future__ import annotations

__all__ = ["bcast_pool"]


def bcast_pool(floor: int = 8, ceiling: int = 64, cpu_share: float = 0.5) -> tuple[int, int]:
    """(min, max) concurrency for a broadcast-holding actor pool."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(floor, min(ceiling, int(cpus * cpu_share))))
