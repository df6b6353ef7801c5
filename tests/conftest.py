from __future__ import annotations

import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from bigdataingestion_spark.session import get_spark

    warehouse = tmp_path_factory.mktemp("warehouse")
    spark = get_spark(
        app_name="bdi-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct_dir() -> str:
    return SF_CORRECT
