"""Crash-recovery proof for stateful incremental SCD2 (VERDICT r6 #4).

tests/test_processor_recovery.py proves exactly-once for APPEND sinks
(content-addressed chunk files collapse checkpoint redelivery). This
module proves it for the harder case — a stateful MERGE whose output
depends on all previous batches: kill the q_stream_scd2_incremental
stream mid-batch AFTER its snapshot write but BEFORE the epoch
commits, restart from the checkpoint, and the final dimension must
hash-equal the one-shot rebuild over all events — versions, validity
intervals, open rows, everything.

Why this is the adversarial moment to die: the crashed batch's
snapshot IS committed on disk (``_SUCCESS`` present), but the source
offset is not. Restart re-delivers the same batch; a merge that
resumed from "the latest snapshot on disk" would apply the batch
TWICE (spurious versions wherever a user's first in-batch state
differs from their last). streaming/scd2.py's rule — merge batch N
against the largest committed ``dim_v{K}`` with K < N — is what makes
redelivery idempotent, and this test is the proof.

Reference semantics anchor: the reference guarantees no in-flight
loss only via drain-then-verify stop
(V1/DisruptorBatchProcessor.java:287-301) and its README documents a
start-race loss bug; checkpointed offsets + disk-derived merge state
give the Spark engine the stronger kill-anywhere guarantee.
"""

from __future__ import annotations

import contextlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.scratch import scratch_dir
from batchprocessor_spark.streaming.scd2 import (
    committed_snapshots,
    latest_snapshot,
    merge_batch,
)
from tests.conftest import SF_SMALL
from tests.oracle import compare, duckdb_run

REGISTRY = load_all()

EVENTS_DDL = "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING"


def _event_slices(n_slices: int):
    """The q_stream_scd2_incremental CDC feed: events globally sorted
    by (ts, event_id), ts cast nanos→micros, cut into contiguous
    slices."""
    table = pq.read_table(
        os.path.join(SF_SMALL, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    ).sort_by([("ts", "ascending"), ("event_id", "ascending")])
    ts_idx = table.schema.get_field_index("ts")
    table = table.set_column(
        ts_idx, "ts", table.column("ts").cast(pa.timestamp("us"))
    )
    rows = table.num_rows
    step = (rows + n_slices - 1) // n_slices
    return [table.slice(i * step, step) for i in range(n_slices)]


def _start_stream(spark, ingest: str, ckpt: str, merge_fn):
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .parquet(ingest)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        stream.writeStream.foreachBatch(merge_fn)
        .option("checkpointLocation", ckpt)
        .start()
    )


def _drop(slices, i, ingest, workdir):
    tmp = os.path.join(workdir, f".tmp_{i}.parquet")
    pq.write_table(slices[i], tmp)
    os.rename(tmp, os.path.join(ingest, f"slice_{i:04d}.parquet"))


def test_kill_mid_batch_restart_equals_oneshot(spark):
    workdir = scratch_dir("bp_scd2_crash_")
    ingest = os.path.join(workdir, "in")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(ingest)
    slices = _event_slices(4)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        # --- run 1: die on batch 1, AFTER the snapshot write ---------
        def crashing_merge(batch_df, batch_id: int) -> None:
            merge_batch(spark, batch_df, batch_id, workdir)
            if batch_id == 1:
                # Snapshot dim_v0001 is committed; the EPOCH is not —
                # the worst-ordered crash for a stateful merge.
                raise RuntimeError("simulated driver death post-merge")

        q1 = _start_stream(spark, ingest, ckpt, crashing_merge)
        try:
            _drop(slices, 0, ingest, workdir)
            q1.processAllAvailable()
            assert [bid for bid, _ in committed_snapshots(workdir)] == [0]
            _drop(slices, 1, ingest, workdir)
            with pytest.raises(Exception, match="simulated driver death"):
                q1.processAllAvailable()
            assert q1.exception() is not None, "stream should have died"
        finally:
            q1.stop()
            # awaitTermination re-raises the (intended) stream failure.
            with contextlib.suppress(Exception):
                q1.awaitTermination(30)

        # The adversarial state: batch 1's snapshot committed, its
        # offset not — redelivery incoming.
        assert [bid for bid, _ in committed_snapshots(workdir)] == [0, 1]

        # --- run 2: restart on the same checkpoint, healthy merge ----
        def healthy_merge(batch_df, batch_id: int) -> None:
            merge_batch(spark, batch_df, batch_id, workdir)

        q2 = _start_stream(spark, ingest, ckpt, healthy_merge)
        try:
            # Batch 1 replays from the checkpoint WAL before new data.
            q2.processAllAvailable()
            _drop(slices, 2, ingest, workdir)
            q2.processAllAvailable()
            _drop(slices, 3, ingest, workdir)
            q2.processAllAvailable()
        finally:
            q2.stop()
            q2.awaitTermination(30)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    final = spark.read.parquet(latest_snapshot(workdir)).select(
        "user_id", "state", "version", "valid_from_s", "valid_to_s", "is_current"
    )
    # The incrementally-maintained, crash-interrupted, checkpoint-
    # recovered dimension equals the one-shot rebuild over all events
    # (q_stream_scd2_incremental's oracle SQL) — rows, schema, values.
    oracle = duckdb_run(REGISTRY["q_stream_scd2_incremental"].oracle, SF_SMALL)
    compare(final, oracle, "scd2_crash_recovery")

    # Structural exactly-once: version chains are gapless 1..N per
    # user with exactly one open row — a double-applied batch would
    # duplicate or skip version numbers before it shifted any hash.
    pdf = final.toPandas().sort_values(["user_id", "version"])
    for uid, grp in pdf.groupby("user_id"):
        assert list(grp["version"]) == list(range(1, len(grp) + 1)), uid
        assert int(grp["is_current"].sum()) == 1, uid


def test_replay_ignores_own_crashed_snapshot(spark):
    """Unit form of the replay-safety rule: with dim_v0000 and
    dim_v0001 both committed, a redelivery of batch 1 must merge
    against dim_v0000 — latest_snapshot(before_batch=1) — never
    against its own prior attempt."""
    workdir = scratch_dir("bp_scd2_rule_")
    for bid in (0, 1):
        d = os.path.join(workdir, f"dim_v{bid:04d}")
        os.makedirs(d)
        open(os.path.join(d, "_SUCCESS"), "w").close()
    assert latest_snapshot(workdir) == os.path.join(workdir, "dim_v0001")
    assert latest_snapshot(workdir, before_batch=1) == os.path.join(
        workdir, "dim_v0000"
    )
    assert latest_snapshot(workdir, before_batch=0) is None
    # A torn write (no _SUCCESS) is not a snapshot at all.
    os.makedirs(os.path.join(workdir, "dim_v0002"))
    assert latest_snapshot(workdir) == os.path.join(workdir, "dim_v0001")
