"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Skip the per-actor arena pre-faulting in tests: fixtures are tiny, and
# warming 112 MB per actor only adds wall time (it's a bench/production
# optimization — see whakoom_webscrapper_ray.warm_worker).
os.environ.setdefault("WKM_WARM_NUMPY_MB", "0")
os.environ.setdefault("WKM_WARM_ARROW_MB", "0")


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
def small_web():
    """The deterministic small synthetic web (FIXTURES.md §1, seed=42)."""
    from whakoom_webscrapper_ray.sources.synth import SMALL, generate_web

    return generate_web(SMALL)


@pytest.fixture(scope="session")
def small_golden(small_web):
    """Sequential-oracle golden outputs for the small web."""
    from whakoom_webscrapper_ray.oracle import run_oracle

    return run_oracle(
        small_web["pages"], small_web["seeds"], small_web["robots"]
    )
