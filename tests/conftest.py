import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from voter_gateway_spark.session import build_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_spark(app_name="vgs-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for hypothesis tests (function-scoped @given bodies
    reuse the session-scoped SparkSession)."""
    return spark
