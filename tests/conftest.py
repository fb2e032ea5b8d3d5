"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


# Ray Data's driver-side bookkeeping (per-dataset loggers, the
# global stats actor) grows with every Dataset created in a session;
# past ~1000 datasets each new execution slows markedly, and an
# 850-test suite creates several thousand. Recycling the local Ray
# session every ~120 tests keeps per-test cost flat — measured: the
# un-recycled suite crawled indefinitely in its last decile, the
# recycled one finishes in minutes. Session-scoped data fixtures
# hold only pandas/pyarrow objects, so a restart is safe.
_RECYCLE_EVERY = 120
_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _ray_session_recycler():
    yield
    # A partially-consumed Dataset (limit/take/iterator abandoned
    # mid-stream) leaves its streaming executor alive holding actor
    # CPUs until Python GC runs; on a 4-CPU test cluster a couple of
    # leaked executors starve the next hash-shuffle join into a
    # multi-minute stall. Collect promptly after every test.
    import gc

    gc.collect()
    _test_counter["n"] += 1
    if _test_counter["n"] % _RECYCLE_EVERY == 0:
        import ray

        if ray.is_initialized():
            ray.shutdown()
            ray.init(
                address="local",
                num_cpus=4,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False


@pytest.fixture(scope="session")
def small_corpus():
    """~200-doc deterministic corpus (FIXTURES.md sf-small tier)."""
    from ocr_service_ray.sources.synth import generate_corpus

    return generate_corpus(200, seed=42, skew_fraction=0.02)


@pytest.fixture(scope="session")
def corrections_db():
    from ocr_service_ray.kernels.correct import CorrectionsDB
    from ocr_service_ray.sources.synth import corrections_entries

    return CorrectionsDB(corrections_entries())
