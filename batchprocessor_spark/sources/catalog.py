"""Parquet table catalog over a scale-factor directory.

The engine's tables are one parquet file/dir per table under an
``sf_dir`` (see /root/repo/TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and partition pruning for free — at 100 TB these would be
partitioned parquet/iceberg directories and nothing here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Redistribute a DataFrame across the cluster before CPU-bound
    per-row work. Needed because a single parquet file with one row
    group scans as ONE task no matter the split config — on a real
    multi-file table this is a no-op decision, but the explicit hash
    repartition also lets downstream joins on the same key reuse the
    exchange."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Accepts both ``<sf>/<name>.parquet`` files and
    ``<sf>/<name>/`` directories so the same catalog works on real
    partitioned layouts.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    rejects by default; we read it as raw nanos (legacy conf, runtime
    settable) and convert to a microsecond TimestampType with integer
    division (nanos ≈ 1.7e18 exceed double precision — `div`, not `/`).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        path = os.path.join(sf_dir, name)
    if name == "events":
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            # Session factory (session.get_spark) sets this at build
            # time; sessions constructed elsewhere (driver harness,
            # bare tests) still need it — runtime-settable legacy conf.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
