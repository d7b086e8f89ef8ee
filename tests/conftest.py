import pytest
import ray


import os

# override with GRAFT_TEST_SF=/root/testdata/sf0.01 to mirror the driver's
# correctness scale
SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
