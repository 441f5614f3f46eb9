"""Shared fixtures.  Ray is initialised ONCE per pytest session (only when a
test actually requests the ``ray_session`` fixture) and shut down at
teardown — per the repo build rules."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from georay.util import tune_malloc
    tune_malloc()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
