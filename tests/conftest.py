import sys
from pathlib import Path

import pytest
from hypothesis import settings

# deterministic property tests: the driver's pytest run must never fail
# on a freshly-discovered example
settings.register_profile("ci", derandomize=True, deadline=None)
settings.load_profile("ci")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")

from lieu_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="lieu_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
