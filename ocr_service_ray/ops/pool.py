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

__all__ = ["bcast_pool", "bcast_stage", "measured_nbytes"]


def bcast_pool(floor: int = 8, ceiling: int = 64, cpu_share: float = 0.5) -> tuple[int, int]:
    """(min, max) concurrency for a broadcast-holding actor pool."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(floor, min(ceiling, int(cpus * cpu_share))))


# Past this artifact size the per-task plasma get + __init__ rebuild
# stops being negligible and the stage should amortize it once per
# actor instead. 8 MiB ≈ a 1M-row int64 key array — comfortably above
# every "bounded by duplicates / dimension-sized by contract" artifact
# at sandbox scale, comfortably below the bloom bitmaps and gram sets
# a dup-heavy web corpus produces.
BCAST_ACTOR_THRESHOLD = 8 << 20


def measured_nbytes(obj) -> int | None:
    """Measured size bound for a broadcast artifact that is a plain
    Python container (key list, gram set, term->idf dict): the length
    of one pickle of the object — exactly the bytes ``ray.put`` will
    ship, so string-heavy artifacts can't slip under a fixed
    per-slot guess and land in the task tier (where ``__init__``
    rebuilds the artifact per BATCH — the inversion the actor tier
    exists to avoid). One serialization, paid once at stage build;
    ``ray.put`` pays the same cost again regardless. Returns ``None``
    (→ actor tier, the safe side) if the object can't be pickled."""
    import pickle

    try:
        return len(pickle.dumps(obj, protocol=5))
    except Exception:
        return None


# Task-tier contract guard: in the task tier ``cls.__init__`` runs
# once per BATCH, so it must only unpack/reshape the broadcast
# artifact. This is a convention, not a type — a future stage with a
# heavyweight init and a small artifact would silently pay per-batch
# setup (the classic anti-pattern this repo otherwise avoids). The
# guard measures the FIRST construction in each worker process and
# warns once when it exceeds the threshold.
INIT_WARN_SECONDS = 0.01
_init_warned: set = set()


def _check_init_time(cls, elapsed: float) -> None:
    if elapsed > INIT_WARN_SECONDS and cls not in _init_warned:
        _init_warned.add(cls)
        import warnings

        warnings.warn(
            f"bcast_stage task tier: {cls.__name__}.__init__ took "
            f"{elapsed * 1e3:.1f}ms and re-runs once per BATCH in this "
            "tier; pass nbytes=None to pin the actor-pool tier "
            "(init amortized once per actor)",
            RuntimeWarning,
            stacklevel=3,
        )


def bcast_stage(ds, cls, nbytes: int | None, *, batch_format: str = "pyarrow", **map_kwargs):
    """``map_batches`` a broadcast-holding callable CLASS, tiered by
    the broadcast artifact's size.

    Under :data:`BCAST_ACTOR_THRESHOLD` the stage runs as a plain TASK
    pool — a fresh ``cls()`` per batch, whose ``__init__``'s
    ``ray.get`` hits local plasma in sub-ms for a small artifact —
    because an autoscaling actor pool pays 1.5-3s of spawn/ramp before
    reaching full throughput (measured at 32 CPUs), a fixed cost that
    dominates sandbox-scale stages and never amortizes on short jobs;
    tasks also fuse with adjacent task-pool maps, which actors never
    do. At or above the threshold (``nbytes=None`` means "unknown —
    assume big") the stage is the classic ``bcast_pool`` ACTOR pool
    and the artifact get + ``__init__`` build amortize once per actor.

    Contract: ``cls.__init__`` must only unpack/reshape the broadcast
    artifact (every current call site does) — under the threshold it
    runs once per BATCH, so callers with a heavyweight init must pass
    ``nbytes=None`` to pin the actor tier. The contract is guarded:
    a first construction exceeding :data:`INIT_WARN_SECONDS` in task
    mode emits a ``RuntimeWarning`` (once per class per worker)."""
    if nbytes is not None and nbytes <= BCAST_ACTOR_THRESHOLD:
        ctor_kwargs = map_kwargs.pop("fn_constructor_kwargs", None) or {}

        def task_fn(batch, _cls=cls, _kw=ctor_kwargs):
            import time

            t0 = time.perf_counter()
            inst = _cls(**_kw)
            _check_init_time(_cls, time.perf_counter() - t0)
            return inst(batch)

        return ds.map_batches(task_fn, batch_format=batch_format, **map_kwargs)
    return ds.map_batches(
        cls, batch_format=batch_format, concurrency=bcast_pool(), **map_kwargs
    )
