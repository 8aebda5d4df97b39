from __future__ import annotations

import pytest

from wheels_in_motion_analytics_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the full pre-commit tier)",
    )


def pytest_collection_modifyitems(config, items):
    # Default run skips the slow tier so the whole suite fits the driver's
    # verify wall budget (the r10 verify was truncated mid-suite at ~31
    # min); slow tests stay mandatory before committing registry/oracle
    # changes via `--runslow` (CLAUDE.md). Skips are visible in the
    # summary — nothing silently disappears.
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    session = get_session("wheels-tests", master="local[4]", shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
