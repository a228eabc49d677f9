from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
SF_ORACLE_BIG = os.environ.get("SPARK_GRAFT_ORACLE_SF_BIG", "/root/testdata/sf0.1")


@pytest.fixture(scope="session")
def spark():
    from batchprocessor_spark.session import get_spark

    s = get_spark("bp-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
