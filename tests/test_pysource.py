"""Custom Python DataSource tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.sources.pysource import SyntheticDocsDataSource


def _read(spark, **options):
    spark.dataSource.register(SyntheticDocsDataSource)
    reader = spark.read.format("synthetic_docs")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def test_row_count_and_schema(spark):
    df = _read(spark, rows=5000, partitions=16)
    assert df.count() == 5000
    assert df.columns == ["doc_id", "text", "lang", "n_words"]
    assert df.select(F.countDistinct("doc_id")).collect()[0][0] == 5000


def test_deterministic_across_partitionings(spark):
    """Same seed ⇒ identical rows regardless of partition count —
    generation is keyed by doc_id, not by partition."""
    a = sorted(map(tuple, _read(spark, rows=300, partitions=4).collect()))
    b = sorted(map(tuple, _read(spark, rows=300, partitions=11).collect()))
    assert a == b


def test_parallel_generation(spark):
    df = _read(spark, rows=1000, partitions=8)
    assert df.rdd.getNumPartitions() == 8


def test_composes_with_engine_operators(spark):
    """The custom source feeds the engine's own operators — e.g. the
    text-stats shape over generated documents."""
    df = _read(spark, rows=500, partitions=8)
    stats = df.select(
        "doc_id", F.size(F.split("text", " ")).alias("w")
    ).where(F.col("w") > 0)
    assert stats.count() == 500
    got = stats.join(df, "doc_id").where(F.col("w") != F.col("n_words")).count()
    assert got == 0
