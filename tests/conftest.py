from __future__ import annotations

import pytest

from weatherdb_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session", autouse=True)
def _isolated_user_config(tmp_path_factory):
    """Keep the test run independent of any real user config on the
    machine (the engine reads ~/.config/weatherdb_spark by default)."""
    import os

    os.environ.setdefault(
        "WEATHERDB_SPARK_MAIN_CONFIG_DIR",
        str(tmp_path_factory.mktemp("no_user_config")),
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="weatherdb_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
