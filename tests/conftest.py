from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from osm_pbf_parquet_spark.session import get_spark

    s = get_spark("tests")
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end differential tests"
    )
