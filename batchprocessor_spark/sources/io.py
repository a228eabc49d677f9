"""Batch format IO (sources & sinks): parquet / csv / json / orc.

The reference's only "sink" is a user callback; an analytics engine
additionally needs durable format sinks. Thin, explicit wrappers over
``spark.read``/``df.write`` — the value is the enforced defaults:
explicit schemas on text formats (schema inference is a full extra
scan at 100 TB) and partitioned writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_READERS = {"parquet", "csv", "json", "orc"}


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a table. For csv/json a schema is REQUIRED — inference
    costs a second full scan of the input at scale."""
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READERS)}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema at scale")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write a table; ``partition_by`` produces the directory layout
    that enables partition pruning for downstream readers."""
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READERS)}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
