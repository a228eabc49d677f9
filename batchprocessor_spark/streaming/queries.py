"""Streaming operator surface (SURVEY.md §2.3), run to completion in
batch-deterministic mode for the driver's correctness harness.

Each q_stream_* replays `events.parquet` through a real Structured
Streaming query (file source → transformations → memory/foreachBatch
sink) with `Trigger.AvailableNow`, waits for completion, and returns
the resulting DataFrame. Semantics map to the reference's operators:
micro-batch accumulation (O1–O5), interval flush (O6), explicit
drain (O7/O15) — see SURVEY.md §2.1 for the file:line inventory.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


EVENTS_RAW_DDL = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def _events_stream(spark: SparkSession, sf_dir: str, max_files: int | None = None) -> DataFrame:
    """`events` replayed as a file-source stream. The parquet stores
    ts as TIMESTAMP(NANOS) → read as raw nano longs (same legacy conf
    as the batch catalog) and convert with integer division."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_DDL)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_to_memory(
    stream_df: DataFrame, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow ≈ the
    reference's drain-on-stop, O15) into an in-memory table and return
    it as a batch DataFrame."""
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"bp_ckpt_{name}")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


@register("q_stream_microbatch_ingest", oracle=None, category="streaming")
def q_stream_microbatch_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1–O5: stream-ingest events, count per event_type. The memory
    sink receives the final aggregate after the stream drains; the
    no-loss check is total count == table count (asserted in pytest
    and implied by the row hash)."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return run_to_memory(agg)


@register("q_stream_tumbling_watermark", oracle=None, category="streaming")
def q_stream_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window WITH watermark on a real stream —
    the streaming twin of q_win_tumbling. With AvailableNow over a
    single replay no data is late, so results equal the batch query."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "event_type",
            "cnt",
        )
    )
    return run_to_memory(agg)


@register("q_stream_dedup_state", oracle=None, category="streaming")
def q_stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (dropDuplicates on keys within the
    watermark) — the reference had no dedup at all; this is the engine
    extension. Returns the deduped key set, which is deterministic
    regardless of which physical row the state store kept."""
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(deduped, output_mode="append")
