"""Durable sink tests: parquet flush target + epoch-idempotent
foreachBatch writer."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from batchprocessor_spark.streaming.processor import BatchProcessor, ProcessorConfig
from batchprocessor_spark.streaming.sinks import (
    exactly_once_foreach_batch,
    parquet_table_sink,
)


def test_processor_to_parquet_table(spark, tmp_path):
    """BatchProcessor + parquet sink: every accepted item lands in the
    output table exactly once."""
    out = str(tmp_path / "out")
    p = BatchProcessor(
        spark,
        "id BIGINT, v DOUBLE",
        parquet_table_sink(out),
        ProcessorConfig(batch_size=64, spool_size=256),
    ).start()
    p.put_many([(i, i * 0.5) for i in range(1000)])
    p.stop()
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.select(F.countDistinct("id")).collect()[0][0] == 1000
    p.close()


def test_exactly_once_epochs(spark, tmp_path):
    """Replaying an epoch overwrites rather than duplicates."""
    out = str(tmp_path / "epochs")
    handler = exactly_once_foreach_batch(out)
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    handler(df, 0)
    handler(df, 1)
    handler(df, 1)  # simulate epoch retry
    back = spark.read.parquet(out)
    assert back.count() == 200  # not 300
    assert sorted(r.epoch for r in back.select("epoch").distinct().collect()) == [0, 1]
