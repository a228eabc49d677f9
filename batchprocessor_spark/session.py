"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness parity with the DuckDB oracle
(UTC session timezone — parquet timestamps are naive) and for scale
(AQE on, partition coalescing, Arrow for pandas UDF exchange). On a
real cluster the same settings apply; only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Spark's own default for spark.sql.files.maxPartitionBytes — the
# engine keeps it in production and merely makes it explicit (and
# env-overridable) so the polarity is testable.
#
# History: rounds ≤7 also carried a FIXTURE_SPLIT_BYTES="4m" harness
# opt-in because the driver fixtures are single parquet files that
# scan as one task under 128m. Round 8 retired it (VERDICT r7 #3):
# the harness now mirrors those fixtures into directory-per-table
# layouts (scripts/fixture_layout.py), so every lane — tests, bench,
# parity, plan dumps — runs under this production default and scan
# parallelism comes from the file layout, as on a real cluster.
PRODUCTION_SPLIT_BYTES = "128m"


def engine_confs(
    cpus: int | str,
    shuffle_partitions: int | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, str]:
    """The engine's session configuration as a plain dict.

    Split out of `get_spark` so the *default polarity* is unit-testable
    without building a JVM session (the live session is a process-wide
    singleton, so a test can't observe what a fresh default would be).
    `env` defaults to os.environ; inject a dict to test overrides.
    """
    env = os.environ if env is None else env
    return {
        # Correctness parity: interpret timestamps consistently with the
        # (timezone-naive) parquet test data and the DuckDB oracle.
        "spark.sql.session.timeZone": "UTC",
        # Scale posture: adaptive execution re-plans at shuffle
        # boundaries (skew joins, partition coalescing, join demotion).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or 2 * int(cpus)),
        # Arrow for any pandas-UDF exchange (vectorized, not per-row).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        # PRODUCTION default scan split: Spark's own 128m. Scan
        # parallelism is bounded by max(file count, bytes/split); on
        # real multi-file tables 128m yields one task per ~128 MB of
        # data, and on many-small-file tables the planner's
        # bytesPerCore packing keeps parallelism at defaultParallelism
        # — which is why the harness mirrors the single-file driver
        # fixtures into directory layouts instead of shrinking this
        # (see PRODUCTION_SPLIT_BYTES above).
        "spark.sql.files.maxPartitionBytes": env.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", PRODUCTION_SPLIT_BYTES
        ),
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
        # default; read as raw nanos once here so readers stay
        # side-effect-free (catalog converts to micros with integer div).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.ui.enabled": "false",
        "spark.driver.memory": env.get("SPARK_DRIVER_MEMORY", "8g"),
    }


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
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in engine_confs(cpus, shuffle_partitions).items():
        builder = builder.config(k, v)
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
