from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from bodo_spark.session import get_spark
    s = get_spark(app_name="bodo_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from bodo_spark.verify import duckdb_conn
    return duckdb_conn(SF_DIR)
