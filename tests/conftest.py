from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow_soak: multi-minute soak/permutation test, skipped unless "
        "SPARK_GRAFT_SLOW_TESTS=1 (the plain suite must finish inside "
        "the driver's budget — VERDICT r13 item 8; every gated law also "
        "has a faster sibling that stays on by default)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow soak; set SPARK_GRAFT_SLOW_TESTS=1 to run")
    for item in items:
        if "slow_soak" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from postgres_es_cdc_spark.session import get_spark

    spark = get_spark(app_name="pytest", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_harness import duck_connection

    return duck_connection(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
