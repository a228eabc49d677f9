"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness parity with the DuckDB oracle
(UTC session timezone — parquet timestamps are naive) and for scale
(AQE on, partition coalescing, Arrow for pandas UDF exchange). On a
real cluster the same settings apply; only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "batchprocessor-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions default to 2×cores locally; AQE coalesces down at runtime,
    and on a real cluster this value would be sized to executor count.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Correctness parity: interpret timestamps consistently with the
        # (timezone-naive) parquet test data and the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Scale posture: adaptive execution re-plans at shuffle
        # boundaries (skew joins, partition coalescing, join demotion).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * int(cpus)))
        # Arrow for any pandas-UDF exchange (vectorized, not per-row).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Scan parallelism is bounded by max(file count, bytes/split)
        # — the fixture tables are SINGLE ~20 MB parquet files, so the
        # default 128 MB split size scans them as ONE task on a
        # 32-core host (measured 15-25% headline cost; BENCH.md round
        # 6 "layout note"). 4 MB splits restore parallelism on the
        # fixtures; a production deployment with real multi-file
        # tables sets this back to 128m (SPARK_GRAFT_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
        # default; read as raw nanos once here so readers stay
        # side-effect-free (catalog converts to micros with integer div).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
