import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from hydro_raster_ray.runtime import tune_context

    tune_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_scheme():
    from hydro_raster_ray import fixtures

    return fixtures.make_scheme(4, 4)
