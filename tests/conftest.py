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
