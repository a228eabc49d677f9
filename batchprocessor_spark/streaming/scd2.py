"""Restart-safe incremental SCD2 maintenance (stateful MERGE).

The merge itself is the q_stream_scd2_incremental algorithm: per
micro-batch, detect state changes with one user_id window over the
BATCH, close the previous snapshot's open rows via a |users|-sized
equi-join, and write an immutable dimension snapshot per batch — the
Delta/Iceberg commit pattern without the table format.

What this module adds over an in-driver closure is the CRASH
CONTRACT. The previous-snapshot pointer is never held in driver
memory; it is re-derived from DISK on every batch as

    the largest committed ``dim_v{K}`` with ``K < batch_id``

which makes the merge a pure function of (batch content, disk state):

- a snapshot is "committed" only when Spark's file committer wrote
  ``_SUCCESS`` — a torn write from a crash mid-snapshot is invisible;
- replaying an UNCOMMITTED batch N after a crash (the file source
  re-delivers it from the checkpoint) merges against ``dim_v{K<N}``
  again — never against N's own possibly-written snapshot, so
  at-least-once redelivery cannot double-apply a change (the
  ``before_batch`` filter is the exactly-once half the snapshot
  naming convention exists for);
- the overwrite of ``dim_v{N}`` replaces any partial/committed
  remnant of the crashed attempt.

Combined with checkpointed source offsets this gives exactly-once
maintenance of the dimension across driver death, the same guarantee
the reference's drain-then-verify stop protects for its in-flight
items (batchprocessor reference: V1/DisruptorBatchProcessor.java:287-301
drain-before-return; V3 README documents the start-race loss this
design removes). Proven by tests/test_scd2_recovery.py: kill the
stream mid-batch after the snapshot write, restart from the
checkpoint, final dimension hash-equals the one-shot rebuild.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SNAP_PREFIX = "dim_v"
_SNAP_RE = re.compile(r"dim_v(\d+)$")


def committed_snapshots(workdir: str) -> list[tuple[int, str]]:
    """(batch_id, path) for every snapshot whose write COMMITTED
    (``_SUCCESS`` present), ordered by batch id. A crash mid-write
    leaves no ``_SUCCESS`` and is therefore not a snapshot."""
    out = []
    for d in glob.glob(os.path.join(workdir, SNAP_PREFIX + "*")):
        m = _SNAP_RE.search(d)
        if m and os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append((int(m.group(1)), d))
    return sorted(out)


def latest_snapshot(workdir: str, before_batch: int | None = None) -> str | None:
    """Path of the newest committed snapshot, optionally restricted to
    batches strictly BEFORE ``before_batch`` (the replay-safety rule:
    a re-delivered batch must never see its own crashed attempt)."""
    snaps = committed_snapshots(workdir)
    if before_batch is not None:
        snaps = [s for s in snaps if s[0] < before_batch]
    return snaps[-1][1] if snaps else None


def merge_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, workdir: str
) -> None:
    """Merge one time-ordered change batch into the versioned
    dimension; see module docstring for the crash contract. Intended
    as ``foreachBatch(lambda df, bid: merge_batch(spark, df, bid,
    workdir))``.

    Scale posture: change detection is one user_id window over the
    BATCH plus one |users|-sized equi-join against the open rows of
    the previous snapshot; the snapshot rewrite is dimension-sized
    (≪ fact history) — per-batch work proportional to the batch,
    never reprocessing history."""
    if batch_df.isEmpty():
        return
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_prev = batch_df.withColumn("prev", F.lag("event_type").over(w))
    prev_path = latest_snapshot(workdir, before_batch=batch_id)
    if prev_path is None:
        prev_dim = None
        cand = with_prev.withColumn(
            "open_state", F.lit(None).cast("string")
        ).withColumn("open_version", F.lit(None).cast("int"))
    else:
        prev_dim = spark.read.parquet(prev_path)
        open_rows = prev_dim.where(F.col("is_current") == 1).select(
            "user_id",
            F.col("state").alias("open_state"),
            F.col("version").alias("open_version"),
        )
        cand = with_prev.join(open_rows, "user_id", "left")
    changes = cand.where(
        (
            F.col("prev").isNull()
            & (
                F.col("open_state").isNull()
                | (F.col("open_state") != F.col("event_type"))
            )
        )
        | (F.col("prev").isNotNull() & (F.col("prev") != F.col("event_type")))
    )
    lead_ts = F.lead("ts").over(w)
    new_rows = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        (F.coalesce(F.col("open_version"), F.lit(0)) + F.row_number().over(w))
        .cast("int")
        .alias("version"),
        F.unix_timestamp("ts").alias("valid_from_s"),
        F.coalesce(F.unix_timestamp(lead_ts), F.lit(-1)).alias("valid_to_s"),
        F.when(lead_ts.isNull(), 1).otherwise(0).alias("is_current"),
    )
    if prev_dim is None:
        snapshot = new_rows
    else:
        # close each open row whose user has a new first change
        first_change = new_rows.groupBy("user_id").agg(
            F.min("valid_from_s").alias("next_vf")
        )
        closed = prev_dim.join(first_change, "user_id", "left").select(
            "user_id",
            "state",
            "version",
            "valid_from_s",
            F.when(
                (F.col("is_current") == 1) & F.col("next_vf").isNotNull(),
                F.col("next_vf"),
            )
            .otherwise(F.col("valid_to_s"))
            .alias("valid_to_s"),
            F.when(
                (F.col("is_current") == 1) & F.col("next_vf").isNotNull(),
                F.lit(0),
            )
            .otherwise(F.col("is_current"))
            .alias("is_current"),
        )
        snapshot = closed.unionByName(new_rows)
    out = os.path.join(workdir, f"{SNAP_PREFIX}{batch_id:04d}")
    # mode=overwrite clears a torn remnant of a crashed attempt at
    # THIS batch; _SUCCESS lands only on commit.
    snapshot.write.mode("overwrite").parquet(out)
