from __future__ import annotations

import pytest

from wheels_in_motion_analytics_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    session = get_session("wheels-tests", master="local[4]", shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
