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
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.scratch import scratch_dir
from batchprocessor_spark.sources.catalog import load_table


from contextlib import contextmanager


@contextmanager
def _few_shuffle_partitions(spark: SparkSession, n: int = 8):
    """Stateful streaming ops create one state-store instance per
    shuffle partition; under a default session (200 partitions) these
    small replay scenarios pay 200 state checkpoints per batch. Cap
    the conf for the query start (it is pinned into the checkpoint at
    first run), then restore. A production job sizes this to its
    cluster instead."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


EVENTS_RAW_DDL = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

EVENTS_TS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def _events_stream(spark: SparkSession, sf_dir: str, max_files: int | None = None) -> DataFrame:
    """`events` replayed as a file-source stream, with the SAME
    timestamp units as the batch catalog regardless of how the parquet
    encodes them. A file stream needs an explicit schema, and a
    TIMESTAMP(NANOS) file surfaces ts as a raw nanos BIGINT (legacy
    conf) while a TIMESTAMP(MICROS) file surfaces a native timestamp —
    declaring the wrong one silently shifts every event time 1000×
    (caught by tests/test_stateful.py::test_stream_event_time_units).
    Probe the batch reader's resolved dtype (a footer read, no scan)
    and declare the stream schema to match."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(path):
        path = os.path.join(sf_dir, "events")
    # `events.parquet` may be a single FILE (raw driver fixture) or a
    # DIRECTORY of part files (production layout / fixture mirror) —
    # isfile, not exists: a directory streamed through a
    # pathGlobFilter on its own name would match zero part files and
    # silently yield an empty stream (found when the r8 mirrors made
    # every lane multi-file).
    single_file = os.path.isfile(path)
    raw_is_long = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
    reader = spark.readStream.schema(EVENTS_RAW_DDL if raw_is_long else EVENTS_TS_DDL)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    # The stream source must follow the layout the probe resolved: a
    # single file is picked out of sf_dir by glob; a directory table
    # streams the directory itself.
    if single_file:
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    else:
        raw = reader.parquet(path)
    if raw_is_long:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def run_to_memory(
    stream_df: DataFrame, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow ≈ the
    reference's drain-on-stop, O15) into an in-memory table and return
    it as a batch DataFrame."""
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"bp_ckpt_{name}")
    try:
        with _few_shuffle_partitions(stream_df.sparkSession):
            q = (
                stream_df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # The drained result lives in the in-memory table; the
        # checkpoint is dead weight (review r5: hundreds of bp_ckpt_mem
        # dirs accumulated across parity runs before this).
        shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(name)


@register(
    "q_stream_microbatch_ingest",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS cnt
    FROM events GROUP BY event_type
    """,
    category="streaming",
)
def q_stream_microbatch_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1–O5: stream-ingest events, count per event_type. The memory
    sink receives the final aggregate after the stream drains; the SQL
    oracle pins the no-loss contract exactly — the drained stream
    count per type must equal the batch count per type."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return run_to_memory(agg)


@register(
    "q_stream_tumbling_watermark",
    oracle="""
    SELECT epoch(date_trunc('day', ts))::BIGINT AS win_start,
           event_type,
           count(*)::BIGINT AS cnt
    FROM events GROUP BY 1, 2
    """,
    category="streaming",
)
def q_stream_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window WITH watermark on a real stream —
    the streaming twin of q_win_tumbling. With AvailableNow over a
    single replay no data is late, so the result equals the batch
    window aggregate — which is exactly what the SQL oracle asserts
    (same epoch-aligned day truncation as q_win_tumbling)."""
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


@register(
    "q_stream_time_flush",
    # End-state-contract oracle: the behavior is wall-clock-driven, but
    # its REQUIRED outcome is fixed — 5 accepted, all 5 flushed by the
    # interval trigger, 0 lost. The driver's value hash then enforces
    # the contract, not just "returned some rows".
    oracle="SELECT 5::BIGINT AS accepted, 5::BIGINT AS flushed, 0::BIGINT AS lost",
    category="streaming",
)
def q_stream_time_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 (interval force flush): a BatchProcessor with a huge batch
    size but a short flush interval must still deliver a trickle of
    items — time, not count, triggers the flush. Returns the
    (accepted, flushed, lost) summary row."""
    import time as _time

    from batchprocessor_spark.streaming.processor import BatchProcessor, ProcessorConfig

    sink_items = []
    p = BatchProcessor(
        spark,
        "id BIGINT",
        lambda chunk: sink_items.append(len(chunk)),
        ProcessorConfig(batch_size=10_000, spool_size=10_000, flush_interval_s=0.3),
    ).start()
    try:
        for i in range(5):
            p.put((i,))
        deadline = _time.monotonic() + 15
        while sum(sink_items) < 5 and _time.monotonic() < deadline:
            _time.sleep(0.1)
        stats = p.stop()
    finally:
        p.close()
    return spark.createDataFrame(
        [(stats["accepted"], stats["flushed_items"], stats["accepted"] - stats["flushed_items"])],
        "accepted BIGINT, flushed BIGINT, lost BIGINT",
    )


@register(
    "q_stream_rate_limit",
    # End-state contract: 500 items / batch 10 ⇒ exactly 50 flushes,
    # and the tps=20 bucket must have throttled (elapsed ≥ 1 s).
    oracle="SELECT 50::BIGINT AS flushes, true AS throttled",
    category="streaming",
)
def q_stream_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11 (TPS rate limit): 20 flushes through a tps=20 token bucket
    must take ≥ ~0.75 s. Returns (flushes, throttled)."""
    import time as _time

    import pandas as pd

    from batchprocessor_spark.streaming.flow import FlowControlConfig, FlowController

    ctrl = FlowController(
        lambda chunk: None, FlowControlConfig(batch_size=10, concurrency=8, tps=20.0)
    )
    t0 = _time.monotonic()
    # 50 flushes at tps=20 with a burst allowance of 20 → the last 30
    # must wait ≥ 1.5 s on the token bucket.
    ctrl.wait(ctrl.submit_batch(pd.DataFrame({"id": range(500)})))
    elapsed = _time.monotonic() - t0
    ctrl.shutdown()
    s = ctrl.stats.snapshot()
    return spark.createDataFrame(
        [(s["flushed_batches"], bool(elapsed >= 1.0))],
        "flushes BIGINT, throttled BOOLEAN",
    )


@register(
    "q_stream_retry_dlq",
    # End-state contract: a permanently-failing sink flushes nothing,
    # retries each of the 4 chunks, and dead-letters all 100 items.
    oracle="SELECT 0::BIGINT AS flushed, true AS retried, 100::BIGINT AS dlq_items",
    category="streaming",
)
def q_stream_retry_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12 (retry + DLQ): an always-failing sink exhausts its retries
    and every item lands in the dead-letter parquet table — the
    engine's upgrade over the reference's log-and-drop
    (V2/Worker.java:290-292). Returns (flushed, retries_ge_expected,
    dlq_items)."""
    from batchprocessor_spark.streaming.processor import BatchProcessor, ProcessorConfig

    def failing_sink(chunk):
        raise RuntimeError("sink permanently down")

    p = BatchProcessor(
        spark,
        "id BIGINT",
        failing_sink,
        ProcessorConfig(batch_size=25, spool_size=50, max_retry_count=1, retry_delay_s=0.01),
    ).start()
    try:
        p.put_many([(i,) for i in range(100)])
        stats = p.stop()
        dlq = p.dlq()
        dlq_count = dlq.count() if dlq is not None else 0
    finally:
        p.close()
    return spark.createDataFrame(
        [(stats["flushed_items"], bool(stats["retries"] >= 4), dlq_count)],
        "flushed BIGINT, retried BOOLEAN, dlq_items BIGINT",
    )


@register(
    "q_stream_graceful_stop",
    # End-state contract: every accepted item is delivered on drain.
    oracle="SELECT 2000::BIGINT AS accepted, 2000::BIGINT AS flushed, 0::BIGINT AS lost",
    category="streaming",
)
def q_stream_graceful_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15 (drain-on-stop, the reference's headline no-loss contract,
    T/DisruptorBatchProcessorTest.java:43-44): stop() after 2,000 puts
    delivers every item. Returns (accepted, flushed, lost=0)."""
    import threading

    from batchprocessor_spark.streaming.processor import BatchProcessor, ProcessorConfig

    delivered = [0]
    lock = threading.Lock()

    def sink(chunk):
        with lock:
            delivered[0] += len(chunk)

    p = BatchProcessor(
        spark,
        "id BIGINT",
        sink,
        ProcessorConfig(batch_size=128, spool_size=256, flush_interval_s=0.2),
    ).start()
    try:
        p.put_many([(i,) for i in range(2000)])
        stats = p.stop()  # graceful drain: spool residual + processAllAvailable
    finally:
        p.close()
    return spark.createDataFrame(
        [(stats["accepted"], delivered[0], stats["accepted"] - delivered[0])],
        "accepted BIGINT, flushed BIGINT, lost BIGINT",
    )


@register(
    "q_stream_watermark_late",
    # End-state contract (see docstring sequencing): only the hour-10
    # window is ever finalized, with the 08:00 late row dropped.
    oracle="SELECT 10 AS win_hour, 3::BIGINT AS cnt",
    category="streaming",
)
def q_stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data discard (engine extension — the reference
    has no event time, SURVEY §1.1).

    Three explicitly-sequenced micro-batches (``processAllAvailable``
    between file drops guarantees separate batches and watermark
    advancement):
      1. events at 10:00/10:15/10:30  → watermark becomes 10:20
      2. a LATE event at 08:00 (dropped by the 10:20 watermark) plus
         12:00/12:30                   → watermark becomes 12:20
      3. a 13:00 pusher               → emits the hour-10 window
    Deterministic append-mode output: exactly [(10, 3)] — the late
    row's hour-8 window never appears, and cnt=3 excludes nothing
    else."""
    import pandas as pd

    tmp = scratch_dir("bp_late_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)

    def write_batch(name: str, hours_minutes: list[tuple[int, int]]) -> None:
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(2024, 1, 1, h, m) for h, m in hours_minutes],
                "v": [1.0] * len(hours_minutes),
            }
        )
        # µs timestamps: pandas defaults to ns, which Spark's parquet
        # reader rejects (same hazard as events.parquet).
        pdf.to_parquet(
            os.path.join(src, name),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    stream = (
        spark.readStream.schema("ts TIMESTAMP, v DOUBLE")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.hour(F.col("win.start")).alias("win_hour"), "cnt")
    )
    name = f"late_{uuid.uuid4().hex[:12]}"
    with _few_shuffle_partitions(spark):
        query = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            write_batch("batch_1.parquet", [(10, 0), (10, 15), (10, 30)])
            query.processAllAvailable()
            write_batch("batch_2.parquet", [(8, 0), (12, 0), (12, 30)])
            query.processAllAvailable()
            write_batch("batch_3.parquet", [(13, 0)])
            query.processAllAvailable()
        finally:
            query.stop()
    result = spark.table(name)
    rows = result.collect()
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema) if rows else result



def _click_purchase_join(stream, how: str):
    """Shared clicks⋈purchases construction for the stream-stream join
    twins (inner q_stream_stream_join / outer q_stream_join_outer):
    same watermarks (30 min), same 1-hour preceding-click range
    predicate, same output columns — only the join type differs, so
    the two queries cannot drift apart."""
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        how,
    ).select("purchase_id", "click_id", "p_user")


@register(
    "q_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS p_user
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    category="streaming",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks and a time-bound join
    condition: purchases joined to clicks of the same user within the
    preceding 1 hour. Both sides are real streams (state-store backed
    join); after a full AvailableNow drain the result equals the
    equivalent batch join — asserted in tests/test_stateful.py AND by
    the SQL oracle (an inner stream-stream join emits every match; the
    watermark bounds state, never the drained result)."""
    joined = _click_purchase_join(_events_stream(spark, sf_dir), "inner")
    return run_to_memory(joined, output_mode="append")


@register(
    "q_stream_custom_state",
    oracle="""
    SELECT user_id, count(*)::BIGINT AS event_count,
           sum(round(value * 100)::BIGINT) / 100.0 AS value_sum
    FROM events GROUP BY user_id
    """,
    category="streaming",
)
def q_stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running (count, value_sum) over the events replay. Update-mode
    output keeps the LAST emission per user, which after a full
    AvailableNow drain equals the batch per-user aggregate — asserted
    in tests/test_stateful.py and by the SQL oracle. The state
    accumulates exact integer cents (streaming/stateful.py), so
    value_sum is bit-identical to the oracle's sum(cents)/100.0 no
    matter how the stream was micro-batched."""
    from batchprocessor_spark.streaming.stateful import running_user_counters

    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    counters = running_user_counters(stream)
    out = run_to_memory(counters, output_mode="update")
    # Update mode may emit a user several times across micro-batches;
    # keep the final (highest event_count) row per user.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("event_count").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_count", "value_sum")
    )


@register(
    "q_stream_dedup_state",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    category="streaming",
)
def q_stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (dropDuplicates on keys within the
    watermark) — the reference had no dedup at all; this is the engine
    extension. Returns the deduped key set, which is deterministic
    regardless of which physical row the state store kept — hence the
    exact DISTINCT oracle."""
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(deduped, output_mode="append")


@register(
    "q_stream_incremental_agg",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           sum(round(value * 100)::BIGINT) / 100.0 AS value_sum
    FROM events GROUP BY event_type
    """,
    category="streaming",
)
def q_stream_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized aggregate: events arrive as a sequence
    of real micro-batches; each foreachBatch appends its batch's
    PARTIAL per-type aggregates to a durable partials table, and the
    final answer is the merge of the partials. This is the
    incremental-view pattern (partial-aggregate append + merge) that
    keeps a 100 TB rollup fresh without ever reprocessing history —
    and the SQL oracle pins the strong claim: the incremental result
    equals the one-shot batch aggregate over all events.

    Batches are sequenced explicitly (file drops + processAllAvailable)
    because maxFilesPerTrigger does not reliably split files under
    Trigger.AvailableNow.
    """
    import pyarrow.parquet as pq

    events_path = os.path.join(sf_dir, "events.parquet")
    table = pq.read_table(events_path, columns=["event_id", "event_type", "value"])
    workdir = scratch_dir("bp_incr_")
    ingest = os.path.join(workdir, "in")
    partials = os.path.join(workdir, "partials")
    os.makedirs(ingest)
    n_slices = 4
    rows = table.num_rows
    step = (rows + n_slices - 1) // n_slices
    slices = [table.slice(i * step, step) for i in range(n_slices)]

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # Partials carry exact integer cents: double partials would
        # make the merged total depend on the batch split (summation
        # order), breaking the oracle's batch-equivalence claim.
        (
            batch_df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
            )
            .write.mode("append")
            .parquet(partials)
        )

    stream = (
        spark.readStream.schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .parquet(ingest)
    )
    with _few_shuffle_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            for i, sl in enumerate(slices):
                tmp = os.path.join(workdir, f".tmp_{i}.parquet")
                pq.write_table(sl, tmp)
                os.rename(tmp, os.path.join(ingest, f"slice_{i:04d}.parquet"))
                q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
    result = (
        spark.read.parquet(partials)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("s") / F.lit(100.0)).alias("value_sum"),
        )
    )
    shutil.rmtree(ingest, ignore_errors=True)
    return result


@register(
    "q_stream_session_watermark",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTES
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessioned AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_no
      FROM ordered)
    SELECT user_id,
           (epoch_us(min(ts)) // 1000000)::BIGINT AS sess_start_s,
           count(*)::BIGINT AS n_events
    FROM sessioned GROUP BY user_id, sess_no
    """,
    category="streaming",
)
def q_stream_session_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) on a REAL stream
    with a watermark — the stateful merge-as-events-arrive session
    operator, streaming twin of the batch q_win_session. After a full
    AvailableNow drain the sessionization equals the batch gaps-based
    definition, which the oracle states with lag + running-sum
    session numbering (Spark's session_window end = last event + gap;
    only start/count are emitted, which both definitions share).
    Boundary convention: session_window is end-EXCLUSIVE, so a gap of
    exactly 30:00 starts a NEW session — the oracle's new-session
    predicate is therefore ``>= INTERVAL 30 MINUTES``, the same
    convention as the batch twin q_win_session (ADVICE r2)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("win.start")).alias("sess_start_s"),
            "n_events",
        )
    )
    return run_to_memory(agg)


@register(
    "q_stream_chained_rollup",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTES AS w FROM events)
    SELECT epoch(date_trunc('day', ts))::BIGINT AS day_s,
           event_type,
           count(*)::BIGINT AS cnt
    FROM events GROUP BY 1, 2
    HAVING date_trunc('day', min(ts)) + INTERVAL 1 DAY <= (SELECT w FROM wm)
    """,
    category="streaming",
)
def q_stream_chained_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO chained stateful aggregations in ONE streaming query:
    hour-window counts re-aggregated into day windows by passing the
    hour WINDOW STRUCT itself into the second `F.window` (the
    window-on-window form that propagates event time through multiple
    stateful operators). This is the streaming continuous-aggregate
    cascade — the hourly level absorbs the high-rate input, the daily
    level compacts hourly partials — mirroring the batch
    q_ts_rollup_multires, with state bounded per level by the
    watermark.

    Chained aggregations only run in APPEND mode, which emits a
    window when the watermark passes its END — so a drained replay
    emits exactly the day windows closed by the final watermark
    (max event time − 10 min) and withholds the still-open last day.
    The oracle states THAT contract precisely (the HAVING clause is
    the append-mode emission rule), making the late/held-back
    semantics themselves driver-checked rather than papered over."""
    hourly = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w1"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    daily = (
        hourly.groupBy(F.window(F.col("w1"), "1 day").alias("w2"), "event_type")
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w2.start")).alias("day_s"),
            "event_type",
            "cnt",
        )
    )
    return run_to_memory(daily, output_mode="append")


@register(
    "q_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*)::BIGINT AS cnt,
           sum(round(e.value * 100)::BIGINT)::BIGINT AS cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    category="streaming",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a STATIC
    dimension (customer) micro-batch by micro-batch — the standard
    enrichment pattern (no state store involved: the static side is
    re-resolved per batch, so dimension updates between batches are
    picked up). Aggregates enriched events per market segment in the
    exact cents lane.

    Scale posture: the static side is dimension-sized → broadcast
    into each micro-batch (stateless, unlike stream-stream joins);
    the stream side never shuffles for the join, only for the final
    segment-cardinality aggregate."""
    customers = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = (
        _events_stream(spark, sf_dir)
        .join(F.broadcast(customers), F.col("user_id") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    return run_to_memory(enriched)


@register(
    "q_stream_dedup_ttl",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    category="streaming",
)
def q_stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup: dropDuplicatesWithinWatermark —
    unlike q_stream_dedup_state's plain dropDuplicates (whose key
    state grows FOREVER on an unbounded stream), state here is evicted
    once the watermark passes a key's event time, which is the only
    dedup that survives an unbounded 100 TB/day stream. The API
    guarantees suppression of duplicates arriving within the delay and
    permits re-emission beyond it; the fixture pins the deterministic
    regime — a 35-day delay covers the events table's full 30-day
    span, so every duplicate is in-window and the output equals the
    exact DISTINCT oracle. Production chooses the delay to match the
    real duplicate horizon (minutes, usually) and carries bounded
    state ∝ keys-per-horizon instead of all-time keys."""
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "35 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(deduped, output_mode="append")


@register(
    "q_stream_state_inspect",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS cnt,
           sum(round(value * 100)::BIGINT)::BIGINT AS cents
    FROM events GROUP BY event_type
    """,
    category="streaming",
)
def q_stream_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store INTROSPECTION (Spark 4 `statestore` batch reader):
    run the per-type streaming aggregation to completion, then read
    the query's checkpointed state back as a BATCH DataFrame — the
    ops capability that lets you audit, debug, or migrate stateful
    streaming state without replaying the stream. After a full
    AvailableNow drain the state must equal the batch aggregate,
    which is exactly what the SQL oracle asserts — so this
    driver-checks the state persistence round-trip itself (agg →
    HDFSBackedStateStore files → reader → rows).

    The state value schema uses the operator's internal field order
    (count, sum), read positionally. Cents ride the long lane (at
    100 TB state the accumulator would be decimal, same as the batch
    twin)."""
    import tempfile

    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    name = f"ss_inspect_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"bp_ckpt_{name}")
    try:
        with _few_shuffle_partitions(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # awaitTermination returns False on timeout WITHOUT raising;
            # reading partial state (and rmtree'ing the checkpoint under
            # a live query in the finally) would corrupt the result, so
            # stop the query and fail loudly instead (review r5).
            if not q.awaitTermination(120):
                q.stop()
                raise TimeoutError(
                    "q_stream_state_inspect: availableNow drain exceeded 120s"
                )
        state = spark.read.format("statestore").load(ckpt)
        kcol = state.select("key.*").columns[0]
        vcols = state.select("value.*").columns
        out = state.select(
            F.col(f"key.{kcol}").alias("event_type"),
            F.col(f"value.{vcols[0]}").cast("long").alias("cnt"),
            F.col(f"value.{vcols[1]}").cast("long").alias("cents"),
        )
        # Freeze the (group-count-sized) result so the checkpoint dir
        # can be removed — the lazy statestore read would otherwise pin
        # it on disk for the session lifetime (ADVICE r4).
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


@register(
    "q_stream_join_outer",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS p_user
    FROM events p LEFT JOIN events c
      ON p.user_id = c.user_id AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    """,
    category="streaming",
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the semantics the inner join
    (q_stream_stream_join) cannot express: a purchase with NO click in
    its preceding hour must still emit, with NULL click columns, and
    it can only do so once the watermark proves no matching click can
    ever arrive (state eviction, not end-of-data). That eviction is
    watermark-DRIVEN: unmatched rows sit in the state store until the
    global (min-of-both-sides) watermark passes their join window, so
    the replay appends two far-future sentinel micro-batches (both
    event types — BOTH sides' watermarks must advance past every real
    event + 1 h + the 30 min delay) and maxFilesPerTrigger=1 orders
    them after the data; sentinel rows (user_id < 0) are filtered
    from the result. After the full drain the result equals the batch
    LEFT JOIN — the oracle states it.

    Scale posture: same state-store equi-join shape as the inner
    variant (shuffle both sides on user_id); the time-range condition
    is what BOUNDS the state (clicks older than watermark − 1 h drop,
    unmatched purchases emit-and-drop as the watermark passes) — an
    outer join without the range predicate would hold both streams
    forever."""
    import datetime as _dt

    tmp = scratch_dir("bp_outer_join_")
    src = os.path.join(tmp, "src")
    cols = ["event_id", "ts", "user_id", "event_type"]
    load_table(spark, sf_dir, "events").select(*cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    for i, day in enumerate((_dt.datetime(2024, 2, 15), _dt.datetime(2024, 3, 1))):
        spark.createDataFrame(
            [(-2 * i - 1, day, -1, "click"), (-2 * i - 2, day, -1, "purchase")],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    joined = _click_purchase_join(stream, "leftOuter")
    out = run_to_memory(joined, output_mode="append")
    rows = out.where(F.col("p_user") >= 0).collect()
    shutil.rmtree(tmp, ignore_errors=True)
    return (
        spark.createDataFrame(rows, out.schema)
        if rows
        else out.where(F.col("p_user") >= 0)
    )


@register(
    "q_stream_sliding_watermark",
    oracle="""
    WITH expanded AS (
      SELECT (epoch_us(ts) // 3600000000) * 3600 - k * 3600 AS win_start,
             event_type
      FROM events CROSS JOIN (SELECT unnest(range(2)) AS k))
    SELECT win_start::BIGINT AS win_start, event_type,
           count(*)::BIGINT AS cnt
    FROM expanded GROUP BY 1, 2
    """,
    category="streaming",
)
def q_stream_sliding_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SLIDING window (2 h windows every 1 h) with
    watermark on a real stream — the streaming twin of q_win_sliding
    and the last windowing shape the streaming lane was missing
    beside tumbling (q_stream_tumbling_watermark) and session
    (q_stream_session_watermark): every event contributes to 2
    overlapping windows, and Spark maintains 2 open window states
    per key bounded by the watermark. With AvailableNow over a single
    replay nothing is late, so the drained result equals the batch
    expansion the oracle states (floor to the slide grid, step back
    k slides — the q_win_sliding oracle at 1-hour grain).

    Scale posture: state per (window, event_type) only — the
    watermark closes windows 2 h + 10 min behind the max event time,
    so state is O(open windows x key cardinality) regardless of
    stream length."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "event_type",
            "cnt",
        )
    )
    return run_to_memory(agg)


@register(
    "q_stream_union_sources",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS cnt,
           sum(round(value * 100)::BIGINT)::BIGINT AS cents
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY event_type
    """,
    category="streaming",
)
def q_stream_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UNION of two sources — the multi-topic/multi-path
    ingestion shape (two pipelines landing in one aggregate): two
    independently-constructed file streams over the same events
    table, one filtered to views and one to purchases, unioned BEFORE
    a single grouped aggregate. Spark runs the union as one streaming
    query with two source offsets tracked in one checkpoint — exactly
    what a reader of topic-A + topic-B needs for consistent restart.
    With AvailableNow over a full replay the drained result equals
    the batch aggregate over both types (the oracle).

    Scale posture: each branch applies its filter before the union
    (pushed to its own scan), the union itself is plan-free
    (partition concatenation), and the aggregate is the only
    shuffle."""
    views = _events_stream(spark, sf_dir).where(F.col("event_type") == "view")
    purchases = _events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    agg = (
        views.unionByName(purchases)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    return run_to_memory(agg, output_mode="complete")


@register(
    "q_stream_scd2_incremental",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id,
           event_type AS state,
           row_number() OVER w AS version,
           (epoch_us(ts) // 1000000)::BIGINT AS valid_from_s,
           coalesce((epoch_us(lead(ts) OVER w) // 1000000)::BIGINT,
                    -1) AS valid_to_s,
           (CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="streaming",
)
def q_stream_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 maintenance from a change stream: the events
    arrive as a sequence of time-ordered micro-batches (the standard
    CDC-feed assumption) and each foreachBatch merges them into the
    versioned dimension — closing the open row when a user's state
    changes across a batch boundary, extending version numbers, and
    writing an immutable snapshot per batch (the Delta/Iceberg commit
    pattern without the table format). The oracle is the ONE-SHOT
    batch build (q_scd2_dimension's exact SQL): after the drain, the
    incrementally-maintained dimension must EQUAL what a from-scratch
    rebuild over all events produces — versions, validity intervals,
    open rows, everything. That equality is the claim that lets a
    warehouse maintain a 100 TB dimension with per-batch work
    proportional to the batch, never reprocessing history.

    Scale posture: per batch, change detection is one user_id window
    over the BATCH plus one |users|-sized equi-join against the open
    rows of the previous snapshot; the snapshot rewrite is
    dimension-sized (≪ fact history). Batches sequence via explicit
    file drops + processAllAvailable (the q_stream_incremental_agg
    discipline).

    The merge itself lives in streaming/scd2.py and is RESTART-SAFE:
    the previous-snapshot pointer is re-derived from disk per batch
    (largest committed dim_v{K<batch_id}), never held in driver
    memory — tests/test_scd2_recovery.py kills the stream mid-batch
    and proves the checkpoint-restarted dimension hash-equals the
    one-shot rebuild."""
    import pyarrow.parquet as pq

    from batchprocessor_spark.streaming.scd2 import latest_snapshot, merge_batch

    events_path = os.path.join(sf_dir, "events.parquet")
    table = pq.read_table(
        events_path, columns=["event_id", "ts", "user_id", "event_type"]
    )
    # Time-ordered CDC feed: sort globally by (ts, event_id), slice.
    # Cast nanos → micros up front so the stream schema is a plain
    # timestamp (the raw fixture is TIMESTAMP(NANOS), see
    # _events_stream's probe).
    import pyarrow as pa

    table = table.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    ts_idx = table.schema.get_field_index("ts")
    table = table.set_column(
        ts_idx, "ts", table.column("ts").cast(pa.timestamp("us"))
    )
    workdir = scratch_dir("bp_scd2inc_")
    ingest = os.path.join(workdir, "in")
    os.makedirs(ingest)
    n_slices = 4
    rows = table.num_rows
    step = (rows + n_slices - 1) // n_slices
    slices = [table.slice(i * step, step) for i in range(n_slices)]

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, batch_df, batch_id, workdir)

    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING"
        )
        .parquet(ingest)
        # NTZ → session-zone timestamp (UTC session: identity), so
        # unix_timestamp() matches the oracle's epoch_us // 1e6 floor
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    with _few_shuffle_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            for i, sl in enumerate(slices):
                tmp = os.path.join(workdir, f".tmp_{i}.parquet")
                pq.write_table(sl, tmp)
                os.rename(tmp, os.path.join(ingest, f"slice_{i:04d}.parquet"))
                q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
    shutil.rmtree(ingest, ignore_errors=True)
    return spark.read.parquet(latest_snapshot(workdir)).select(
        "user_id", "state", "version", "valid_from_s", "valid_to_s", "is_current"
    )
