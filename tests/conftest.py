from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iris_pyspark_spark.session import get_spark  # noqa: E402
from iris_pyspark_spark.testing import make_oracle_con  # noqa: E402

#: t2 correctness runs at sf0.01, same as the driver.
SF_DIR = os.environ.get("IRIS_PYSPARK_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="iris-pyspark-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = make_oracle_con(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
