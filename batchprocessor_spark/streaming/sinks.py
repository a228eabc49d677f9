"""Durable streaming sinks.

``parquet_table_sink`` — the engine's durable flush target: a
FlowController-compatible sink callable that appends chunks to a
parquet directory with one file per flush (driver-side pyarrow write,
no Spark job per chunk). Pairs with BatchProcessor for the
"reference semantics + durable output" combination.

``exactly_once_foreach_batch`` — an epoch-idempotent foreachBatch
writer for arbitrary streaming queries: each micro-batch lands in a
parquet subdirectory keyed by epoch id, written atomically
(tmp + rename), so retried epochs overwrite instead of duplicating —
at-least-once delivery upgraded to effectively-once output.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid

import pandas as pd
from pyspark.sql import DataFrame


def parquet_table_sink(path: str):
    """A Sink callable appending each flushed chunk as one parquet
    file under ``path``."""
    os.makedirs(path, exist_ok=True)
    lock = threading.Lock()
    seq = [0]

    def sink(chunk: pd.DataFrame) -> None:
        with lock:
            seq[0] += 1
            n = seq[0]
        tmp = os.path.join(path, f".tmp_{uuid.uuid4().hex}.parquet")
        chunk.to_parquet(tmp, index=False)
        os.rename(tmp, os.path.join(path, f"flush_{n:08d}_{uuid.uuid4().hex[:8]}.parquet"))

    return sink


def idempotent_parquet_sink(path: str, key_col: str):
    """Chunk-idempotent durable sink: the output file name is the
    sha256 of the chunk's SORTED ``key_col`` values, written
    atomically (tmp + rename). Two invariants follow:

    - **torn-write-free**: a sink call that dies before the rename
      leaves no visible output (the ``.tmp_*`` file is ignored by any
      ``chunk_*.parquet`` reader), so FlowController's retry — which
      re-sends the WHOLE chunk, the reference's v2 re-publish
      semantics (V2/Worker.java:288-300) — replaces rather than
      appends;
    - **replay-idempotent**: when a crashed micro-batch epoch is
      replayed from the streaming checkpoint, a chunk that already
      flushed before the crash maps to the SAME file name and
      overwrites itself — at-least-once redelivery becomes
      exactly-once output.

    This is the content-addressed analogue of
    ``exactly_once_foreach_batch``'s epoch-keyed directories for
    FlowController-level (sub-epoch) chunks. ``key_col`` must be
    unique per row (a primary key), which makes the sorted-key hash a
    stable identity for the chunk regardless of row order."""
    os.makedirs(path, exist_ok=True)

    def sink(chunk: pd.DataFrame) -> None:
        import hashlib

        # Length-prefixed encoding: a bare ",".join is ambiguous when a
        # string key itself contains the separator (['a,b'] vs
        # ['a','b'] would collide and silently overwrite). Sorting the
        # ENCODED strings also keeps mixed-type key columns (int+str
        # after a schema change) from raising inside the sink.
        encoded = sorted(f"{len(str(k))}:{k}" for k in chunk[key_col].tolist())
        digest = hashlib.sha256("|".join(encoded).encode()).hexdigest()[:32]
        tmp = os.path.join(path, f".tmp_{uuid.uuid4().hex}.parquet")
        chunk.to_parquet(tmp, index=False)
        os.replace(tmp, os.path.join(path, f"chunk_{digest}.parquet"))

    return sink


def exactly_once_foreach_batch(path: str):
    """foreachBatch handler writing each epoch to ``path/epoch=<id>/``
    atomically; a retried epoch replaces its directory instead of
    appending duplicates. Read the result with
    ``spark.read.parquet(path)`` (epoch becomes a partition column)."""
    os.makedirs(path, exist_ok=True)

    def handle(df: DataFrame, epoch_id: int) -> None:
        final = os.path.join(path, f"epoch={epoch_id}")
        tmp = os.path.join(path, f".tmp_epoch_{epoch_id}_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    return handle
